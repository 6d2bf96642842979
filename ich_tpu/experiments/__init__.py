from ich_tpu.experiments.supervised2d import run_supervised_2d

__all__ = ["run_supervised_2d"]
