from mayamatchmovesolver_tpu.ops import stmap  # noqa: F401  (module)
