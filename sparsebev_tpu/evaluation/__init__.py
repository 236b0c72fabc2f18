from .metrics import NuScenesDetectionEvaluator  # noqa: F401
from .results import format_nusc_submission  # noqa: F401
