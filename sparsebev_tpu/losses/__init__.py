from .focal import focal_loss, focal_loss_cost  # noqa: F401
from .l1 import l1_loss  # noqa: F401
from .matching import hungarian_matching, hungarian_matching_callback  # noqa: F401
from .target import compute_detection_loss  # noqa: F401
from .denoising import prepare_dn_inputs, compute_dn_loss  # noqa: F401
