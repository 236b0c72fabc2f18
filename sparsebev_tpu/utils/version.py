"""Checkpoint back-compat switch (reference /root/reference/models/utils.py:321-325):
``VERSION.name == 'v0.17.1'`` flips the yaw-rotation sign convention
(consumed by ops/projection.py make_sample_points) and enables the w/l+yaw
swap at decode (bbox/nms_free_coder.py; reference
models/sparsebev_head.py:472-476).

Set from the checkpoint's ``version`` tag by utils/checkpoint_io
(torch .pth) or tools/val.py (orbax ``extra.version``) BEFORE any forward
or decode is jitted — the flag is read at trace time.
"""


class Version:
    def __init__(self):
        self.name = "v1.0.0"


VERSION = Version()
