from mayamatchmovesolver_tpu.ops.stmap import (  # noqa: F401
    stmap,
    stmap_classic_pallas,
    stmap_xla,
)
