"""Checkpoint back-compat switch (reference /root/reference/models/utils.py:321-325):
``VERSION.name == 'v0.17.1'`` flips the yaw-rotation sign convention and the
w/l+yaw swap at decode (models/sparsebev_head.py:472-476)."""


class Version:
    def __init__(self):
        self.name = "v1.0.0"


VERSION = Version()
