from mayamatchmovesolver_tpu.ops import stmap  # noqa: F401  (module)
from mayamatchmovesolver_tpu.ops import warp  # noqa: F401  (module)
