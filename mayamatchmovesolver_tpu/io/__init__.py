from mayamatchmovesolver_tpu.io.formatmanager import (  # noqa: F401
    get_formats,
    read,
)
from mayamatchmovesolver_tpu.io.markerdata import (  # noqa: F401
    FileInfo,
    KeyframeData,
    MarkerData,
    markers_to_scene,
)
from mayamatchmovesolver_tpu.io import (  # noqa: F401
    pftrack2dt,
    rz2,
    tdetxt,
    uvtrack,
)
