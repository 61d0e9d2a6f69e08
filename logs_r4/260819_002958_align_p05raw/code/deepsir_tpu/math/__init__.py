from deepsir_tpu.math import se3, se3_np, so3, rand  # noqa: F401
