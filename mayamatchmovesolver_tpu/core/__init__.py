from mayamatchmovesolver_tpu.core.constants import (  # noqa: F401
    FilmFit,
    RotateOrder,
)
from mayamatchmovesolver_tpu.core import camera  # noqa: F401
from mayamatchmovesolver_tpu.core import reprojection  # noqa: F401
from mayamatchmovesolver_tpu.core import transform  # noqa: F401
