from .box_ops import (  # noqa: F401
    normalize_bbox,
    denormalize_bbox,
    encode_bbox,
    decode_bbox,
)
from .geometry import (  # noqa: F401
    rotation_3d_in_axis,
    inverse_sigmoid,
    compose_lidar2img,
)
from .msmv_sampling import (  # noqa: F401
    msmv_sampling,
    msmv_sampling_reference,
)
from .projection import sampling_4d, make_sample_points  # noqa: F401
