"""Checkpoint IO tests: torch->flax ResNet porting produces numerically
identical outputs; revise_keys remap; orbax save/restore roundtrip."""

import numpy as np
import pytest

from sparsebev_tpu.utils.checkpoint_io import (
    apply_revise_keys, port_torch_params, merge_pretrained)


def test_revise_keys():
    sd = {"backbone.conv1.weight": np.zeros(1), "head.fc.weight": np.ones(1)}
    out = apply_revise_keys(sd, [("backbone", "img_backbone")])
    assert "img_backbone.conv1.weight" in out
    assert "head.fc.weight" in out


def _torch_resnet_stem_and_block():
    """A torch stem + one bottleneck matching our ResNet's layer1_0."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    class Bottleneck(tnn.Module):
        def __init__(self, cin, planes, stride=1, downsample=False):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.downsample = (tnn.Sequential(
                tnn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4)) if downsample else None)
            self.relu = tnn.ReLU()

        def forward(self, x):
            idt = self.downsample(x) if self.downsample is not None else x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return self.relu(out + idt)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU()
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            # the full 3-block depth-50 stage 1
            self.layer1 = tnn.Sequential(
                Bottleneck(64, 64, downsample=True),
                Bottleneck(256, 64), Bottleneck(256, 64))

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            return self.layer1(x)

    net = Net()
    # randomize BN stats so porting them actually matters
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.data.normal_(0, 0.5)
            m.running_var.data.uniform_(0.5, 2.0)
    net.eval()
    return torch, net


def test_resnet_porting_numerical_parity(rng):
    torch, net = _torch_resnet_stem_and_block()
    import jax
    import jax.numpy as jnp
    from sparsebev_tpu.models.resnet import ResNet

    sd = {f"backbone.{k}": v.detach().numpy()
          for k, v in net.state_dict().items()}
    ported = port_torch_params(sd, backbone_type="ResNet")

    # our ResNet with only stage 1 (1 block)
    model = ResNet(depth=50, num_stages=1, out_indices=(0,))
    x = rng.randn(2, 64, 64, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = merge_pretrained(
        {"params": dict(variables["params"]),
         "batch_stats": dict(variables["batch_stats"])},
        {"params": ported["params"]["backbone"],
         "batch_stats": ported["batch_stats"]["backbone"]})

    got = np.asarray(model.apply(variables, jnp.asarray(x))[0])
    with torch.no_grad():
        want = net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    want = want.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_orbax_roundtrip(tmp_path, rng):
    import jax.numpy as jnp
    import optax
    from sparsebev_tpu.train.step import TrainState, create_train_state
    from sparsebev_tpu.utils.checkpoint_io import (
        save_checkpoint, latest_checkpoint, restore_train_state)

    params = {"w": jnp.asarray(rng.randn(4, 4).astype(np.float32))}
    tx = optax.adam(1e-3)
    state = create_train_state({"params": params, "batch_stats": {}}, tx)
    state = state.replace(step=jnp.asarray(7, jnp.int32))

    path = save_checkpoint(str(tmp_path), 7, state, max_keep=2)
    assert latest_checkpoint(str(tmp_path)) == path

    fresh = create_train_state(
        {"params": {"w": jnp.zeros((4, 4))}, "batch_stats": {}}, tx)
    restored = restore_train_state(path, fresh)
    np.testing.assert_allclose(np.asarray(restored.params["w"]),
                               np.asarray(params["w"]))
    assert int(restored.step) == 7

    # max_keep pruning
    state2 = state.replace(step=jnp.asarray(9, jnp.int32))
    save_checkpoint(str(tmp_path), 9, state2, max_keep=1)
    import os
    ckpts = [d for d in os.listdir(tmp_path) if d.startswith("ckpt_")]
    assert ckpts == ["ckpt_9"]


def test_resume_restores_version_tag(tmp_path, rng):
    """The forward is VERSION-dependent (v0.17.1 yaw convention): a resume
    from a checkpoint saved while VERSION was v0.17.1 must restore the tag,
    like tools/val.py --weights does (reference val.py:122-129)."""
    import jax.numpy as jnp
    import optax
    from sparsebev_tpu.train.step import create_train_state
    from sparsebev_tpu.utils.checkpoint_io import (save_checkpoint,
                                                   restore_train_state)
    from sparsebev_tpu.utils.version import VERSION

    params = {"w": jnp.asarray(rng.randn(2, 2).astype(np.float32))}
    state = create_train_state({"params": params, "batch_stats": {}},
                               optax.adam(1e-3))
    old = VERSION.name
    try:
        VERSION.name = "v0.17.1"
        path = save_checkpoint(str(tmp_path), 1, state)
        VERSION.name = "v1.0.0"
        restore_train_state(path, state)
        assert VERSION.name == "v0.17.1"
    finally:
        VERSION.name = old
