from . import layers  # noqa: F401
from . import decoder  # noqa: F401
from . import head  # noqa: F401
from . import resnet  # noqa: F401
from . import fpn  # noqa: F401
from . import detector  # noqa: F401
from . import vovnet  # noqa: F401
from . import eva02  # noqa: F401
