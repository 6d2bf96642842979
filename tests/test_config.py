import json

import pytest

from ich_tpu.utils.config import AttrDict, Config, Registry, rgetattr


def test_attrdict_nested_access():
    d = AttrDict.from_nested_dicts(
        {"a": 1, "b": {"c": [1, {"d": 2}], "e": "x"}}
    )
    assert d.a == 1
    assert d.b.c[1].d == 2
    assert d.b.e == "x"
    d.b.e = "y"
    assert d["b"]["e"] == "y"
    assert not hasattr(d, "missing")


def test_attrdict_json_roundtrip(tmp_path):
    path = str(tmp_path / "cfg.json")
    src = {"exp": {"lr": 1e-3, "sizes": [1, 2, 3]}, "name": "unet"}
    with open(path, "w") as f:
        json.dump(src, f)
    d = AttrDict.from_json_path(path)
    assert d.exp.lr == 1e-3
    out = str(tmp_path / "out.json")
    d.to_json_path(out)
    with open(out) as f:
        assert json.load(f) == src


def test_config_load_save(tmp_path):
    path = str(tmp_path / "cfg.json")
    with open(path, "w") as f:
        json.dump({"k": 5}, f)
    cfg = Config().load_config(path)
    assert cfg.settings.k == 5
    cfg.settings.k = 7
    out = str(tmp_path / "cfg2.json")
    cfg.save_config(out)
    assert json.load(open(out)) == {"k": 7}


def test_rgetattr():
    class A:
        pass

    a = A()
    a.b = A()
    a.b.c = 42
    assert rgetattr(a, "b.c") == 42
    assert rgetattr(a, "b.missing", None) is None


def test_registry():
    reg = Registry("thing")

    @reg.register()
    def foo(x):
        return x + 1

    reg.add("bar", lambda x: x * 2)
    assert reg.build("foo", 1) == 2
    assert reg.build("bar", 3) == 6
    assert "foo" in reg and "baz" not in reg
    with pytest.raises(KeyError):
        reg.get("baz")
    with pytest.raises(KeyError):
        reg.add("foo", foo)
