from .logging import init_logging, backup_code  # noqa: F401
from .dump import DUMP  # noqa: F401
from .version import VERSION  # noqa: F401
from .checkpoint_io import (  # noqa: F401
    save_checkpoint, load_checkpoint, latest_checkpoint, restore_train_state,
    load_torch_checkpoint, apply_revise_keys, port_torch_params,
    merge_pretrained)
