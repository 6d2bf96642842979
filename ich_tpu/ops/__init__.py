from ich_tpu.ops import ct, losses, metrics

__all__ = ["ct", "losses", "metrics"]
