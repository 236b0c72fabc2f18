import os
import textwrap

import pytest

from sparsebev_tpu.config import Config
from sparsebev_tpu.registry import Registry, build


def _write(tmp_path, name, content):
    p = tmp_path / name
    p.write_text(textwrap.dedent(content))
    return str(p)


def test_config_fromfile_basic(tmp_path):
    f = _write(tmp_path, "a.py", """
        embed_dims = 256
        model = dict(type='SparseBEV', head=dict(type='H', num_query=900))
    """)
    cfg = Config.fromfile(f)
    assert cfg.embed_dims == 256
    assert cfg.model.type == "SparseBEV"
    assert cfg.model.head.num_query == 900


def test_config_base_inheritance(tmp_path):
    _write(tmp_path, "base.py", """
        model = dict(type='A', head=dict(num_query=900, scale=1))
        lr = 1e-4
    """)
    f = _write(tmp_path, "child.py", """
        _base_ = ['./base.py']
        model = dict(head=dict(num_query=400))
    """)
    cfg = Config.fromfile(f)
    assert cfg.model.type == "A"          # inherited
    assert cfg.model.head.num_query == 400  # overridden
    assert cfg.model.head.scale == 1       # merged
    assert cfg.lr == 1e-4


def test_config_delete_key(tmp_path):
    _write(tmp_path, "base.py", """
        neck = dict(type='FPN', num_outs=4, in_channels=[1, 2])
    """)
    f = _write(tmp_path, "child.py", """
        _base_ = ['./base.py']
        neck = dict(_delete_=True, type='Identity')
    """)
    cfg = Config.fromfile(f)
    assert cfg.neck == {"type": "Identity"}


def test_config_merge_from_dict(tmp_path):
    f = _write(tmp_path, "a.py", "model = dict(head=dict(num_query=900))\nlr = 1e-4")
    cfg = Config.fromfile(f)
    cfg.merge_from_dict({"model.head.num_query": "400", "lr": "0.01", "name": "x"})
    assert cfg.model.head.num_query == 400
    assert cfg.lr == 0.01
    assert cfg.name == "x"


def test_registry_build():
    reg = Registry("test")

    @reg.register_module()
    class Foo:
        def __init__(self, a, b=2):
            self.a, self.b = a, b

    obj = build(dict(type="Foo", a=1), reg)
    assert (obj.a, obj.b) == (1, 2)
    obj = reg.build(dict(type="Foo", a=1, b=5))
    assert obj.b == 5
    with pytest.raises(KeyError):
        build(dict(type="Bar"), reg)
    with pytest.raises(KeyError):
        @reg.register_module()
        class Foo:  # noqa: F811  duplicate
            pass
