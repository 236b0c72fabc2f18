"""VoVNet / EVA02 torch-checkpoint porting: key-mapping completeness against
synthetic reference-named state dicts, and numerical parity for the layer
types not already covered by the ResNet test (ConvTranspose, SwiGLU)."""

import logging

import numpy as np
import pytest

from sparsebev_tpu.utils.checkpoint_io import (
    port_torch_params, merge_pretrained, _port_eva02)


class _FailOnWarn(logging.Handler):
    def __init__(self):
        super().__init__(level=logging.WARNING)
        self.records = []

    def emit(self, record):
        self.records.append(record.getMessage())


def _shapes_like(tree, rng):
    import jax
    return jax.tree_util.tree_map(
        lambda x: rng.randn(*np.shape(x)).astype(np.float32), tree)


def test_vovnet_port_mapping_complete(rng):
    """Build a synthetic torch state dict with the reference VoVNet naming
    (stem.stem_1/conv..., stageN.OSAN_b.layers.i.TAG/conv...), port it, and
    require every leaf of the flax model to be overwritten."""
    import jax
    import jax.numpy as jnp
    from sparsebev_tpu.models.vovnet import VoVNet

    model = VoVNet(spec_name="V-19-slim-eSE")
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)

    # synthesize the torch dict by inverting the expected mapping
    sd = {}

    def conv_t(kernel):  # HWIO -> OIHW
        return np.transpose(kernel, (3, 2, 0, 1))

    p = variables["params"]
    s = variables["batch_stats"]
    spec_blocks = [1, 1, 1, 1]
    for k in (1, 2, 3):
        sd[f"backbone.stem.stem_{k}/conv.weight"] = conv_t(np.asarray(p[f"stem{k}"]["conv"]["kernel"]))
        sd[f"backbone.stem.stem_{k}/norm.weight"] = np.asarray(p[f"stem{k}"]["norm"]["scale"])
        sd[f"backbone.stem.stem_{k}/norm.bias"] = np.asarray(p[f"stem{k}"]["norm"]["bias"])
        sd[f"backbone.stem.stem_{k}/norm.running_mean"] = np.asarray(s[f"stem{k}"]["norm"]["mean"])
        sd[f"backbone.stem.stem_{k}/norm.running_var"] = np.asarray(s[f"stem{k}"]["norm"]["var"])
    for stage in range(2, 6):
        for b in range(spec_blocks[stage - 2]):
            dst = f"stage{stage}_block{b}"
            src = f"backbone.stage{stage}.OSA{stage}_{b + 1}"
            i = 0
            while f"layer{i}" in p[dst]:
                tag = f"{src}.layers.{i}.OSA{stage}_{b + 1}_{i}"
                sd[f"{tag}/conv.weight"] = conv_t(np.asarray(p[dst][f"layer{i}"]["conv"]["kernel"]))
                sd[f"{tag}/norm.weight"] = np.asarray(p[dst][f"layer{i}"]["norm"]["scale"])
                sd[f"{tag}/norm.bias"] = np.asarray(p[dst][f"layer{i}"]["norm"]["bias"])
                sd[f"{tag}/norm.running_mean"] = np.asarray(s[dst][f"layer{i}"]["norm"]["mean"])
                sd[f"{tag}/norm.running_var"] = np.asarray(s[dst][f"layer{i}"]["norm"]["var"])
                i += 1
            tag = f"{src}.concat.OSA{stage}_{b + 1}_concat"
            sd[f"{tag}/conv.weight"] = conv_t(np.asarray(p[dst]["concat"]["conv"]["kernel"]))
            sd[f"{tag}/norm.weight"] = np.asarray(p[dst]["concat"]["norm"]["scale"])
            sd[f"{tag}/norm.bias"] = np.asarray(p[dst]["concat"]["norm"]["bias"])
            sd[f"{tag}/norm.running_mean"] = np.asarray(s[dst]["concat"]["norm"]["mean"])
            sd[f"{tag}/norm.running_var"] = np.asarray(s[dst]["concat"]["norm"]["var"])
            sd[f"{src}.ese.fc.weight"] = conv_t(np.asarray(p[dst]["ese"]["fc"]["kernel"]))
            sd[f"{src}.ese.fc.bias"] = np.asarray(p[dst]["ese"]["fc"]["bias"])

    # randomize values so a successful merge actually changes the model
    # (variances must stay positive)
    rng2 = np.random.RandomState(1)
    sd = {k: (rng2.uniform(0.5, 2.0, v.shape) if k.endswith("running_var")
              else rng2.randn(*v.shape) * 0.05).astype(np.float32)
          for k, v in sd.items()}

    ported = port_torch_params(sd, backbone_type="VoVNet")
    handler = _FailOnWarn()
    logger = logging.getLogger("portcheck")
    logger.addHandler(handler)
    w0 = np.asarray(variables["params"]["stem1"]["conv"]["kernel"]).copy()
    merged = merge_pretrained(
        {"params": dict(variables["params"]),
         "batch_stats": dict(variables["batch_stats"])},
        {"params": ported["params"]["backbone"],
         "batch_stats": ported["batch_stats"]["backbone"]},
        logger=logger)
    assert not handler.records, handler.records
    # values actually changed
    w1 = np.asarray(merged["params"]["stem1"]["conv"]["kernel"])
    assert not np.allclose(w0, w1)
    # ported model still runs
    out = model.apply(merged, jnp.zeros((1, 64, 64, 3)))
    assert all(np.isfinite(np.asarray(o)).all() for o in out)


def test_deconv_port_parity(rng):
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    tconv = torch.nn.ConvTranspose2d(8, 4, kernel_size=2, stride=2)
    x = rng.randn(2, 5, 7, 8).astype(np.float32)
    with torch.no_grad():
        want = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    want = want.numpy().transpose(0, 2, 3, 1)

    fconv = nn.ConvTranspose(4, (2, 2), strides=(2, 2), transpose_kernel=True)
    variables = fconv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    kernel = np.transpose(tconv.weight.detach().numpy(), (2, 3, 1, 0))
    got = fconv.apply(
        {"params": {"kernel": kernel, "bias": tconv.bias.detach().numpy()}},
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_swiglu_port_parity(rng):
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp
    from sparsebev_tpu.models.eva02 import SwiGLU

    d, hid = 16, 24
    w1 = torch.nn.Linear(d, hid)
    w2 = torch.nn.Linear(d, hid)
    ln = torch.nn.LayerNorm(hid, eps=1e-6)
    w3 = torch.nn.Linear(hid, d)
    x = rng.randn(3, 5, d).astype(np.float32)
    with torch.no_grad():
        tx = torch.from_numpy(x)
        want = w3(ln(torch.nn.functional.silu(w1(tx)) * w2(tx))).numpy()

    def lin(mod):
        return {"linear": {"kernel": mod.weight.detach().numpy().T,
                           "bias": mod.bias.detach().numpy()}}

    params = {"w1": lin(w1), "w2": lin(w2), "w3": lin(w3),
              "ffn_ln": {"scale": ln.weight.detach().numpy(),
                         "bias": ln.bias.detach().numpy()}}
    got = SwiGLU(hid, d).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_eva02_port_mapping(rng):
    """Synthetic detectron2-named EVA02 dict maps onto the flax tree with no
    missing leaves (trunk + pyramid heads)."""
    import jax
    import jax.numpy as jnp
    from sparsebev_tpu.models.eva02 import EVA02

    model = EVA02(img_size=64, real_img_size=(32, 64), patch_size=16,
                  embed_dim=64, depth=2, num_heads=4, window_size=2,
                  window_block_indexes=(0,), fpn_out_channels=32,
                  fpn_scale_factors=(4.0, 2.0, 1.0, 0.5), fpn_top_block=True,
                  pretrain_img_size=32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)))
    p = variables["params"]

    rng2 = np.random.RandomState(2)
    sd = {}
    vit = p["vit"]
    sd["backbone.net.patch_embed.proj.weight"] = rng2.randn(
        *np.transpose(np.asarray(vit["patch_embed"]["kernel"]), (3, 2, 0, 1)).shape
    ).astype(np.float32)
    sd["backbone.net.patch_embed.proj.bias"] = rng2.randn(64).astype(np.float32)
    sd["backbone.net.pos_embed"] = rng2.randn(
        *np.asarray(vit["pos_embed"]).shape).astype(np.float32)
    for i in range(2):
        b = f"backbone.net.blocks.{i}."
        blk = vit[f"block{i}"]
        for nm in ("norm1", "norm2"):
            sd[f"{b}{nm}.weight"] = rng2.randn(64).astype(np.float32)
            sd[f"{b}{nm}.bias"] = rng2.randn(64).astype(np.float32)
        for nm in ("q_proj", "k_proj", "v_proj"):
            sd[f"{b}attn.{nm}.weight"] = rng2.randn(64, 64).astype(np.float32)
        sd[f"{b}attn.q_bias"] = rng2.randn(64).astype(np.float32)
        sd[f"{b}attn.v_bias"] = rng2.randn(64).astype(np.float32)
        sd[f"{b}attn.proj.weight"] = rng2.randn(64, 64).astype(np.float32)
        sd[f"{b}attn.proj.bias"] = rng2.randn(64).astype(np.float32)
        hid = np.asarray(blk["mlp"]["w1"]["linear"]["kernel"]).shape[1]
        sd[f"{b}mlp.w1.weight"] = rng2.randn(hid, 64).astype(np.float32)
        sd[f"{b}mlp.w1.bias"] = rng2.randn(hid).astype(np.float32)
        sd[f"{b}mlp.w2.weight"] = rng2.randn(hid, 64).astype(np.float32)
        sd[f"{b}mlp.w2.bias"] = rng2.randn(hid).astype(np.float32)
        sd[f"{b}mlp.ffn_ln.weight"] = rng2.randn(hid).astype(np.float32)
        sd[f"{b}mlp.ffn_ln.bias"] = rng2.randn(hid).astype(np.float32)
        sd[f"{b}mlp.w3.weight"] = rng2.randn(64, hid).astype(np.float32)
        sd[f"{b}mlp.w3.bias"] = rng2.randn(64).astype(np.float32)

    # SFP: stage4.0 -> [deconv, LN, GELU, deconv, conv, conv] etc.
    def add_conv(base, cin, cout, k):
        sd[f"{base}.weight"] = rng2.randn(cout, cin, k, k).astype(np.float32)
        sd[f"{base}.norm.weight"] = rng2.randn(cout).astype(np.float32)
        sd[f"{base}.norm.bias"] = rng2.randn(cout).astype(np.float32)

    sd["backbone.simfp_2.0.weight"] = rng2.randn(64, 32, 2, 2).astype(np.float32)
    sd["backbone.simfp_2.0.bias"] = rng2.randn(32).astype(np.float32)
    sd["backbone.simfp_2.1.weight"] = rng2.randn(32).astype(np.float32)
    sd["backbone.simfp_2.1.bias"] = rng2.randn(32).astype(np.float32)
    sd["backbone.simfp_2.3.weight"] = rng2.randn(32, 16, 2, 2).astype(np.float32)
    sd["backbone.simfp_2.3.bias"] = rng2.randn(16).astype(np.float32)
    add_conv("backbone.simfp_2.4", 16, 32, 1)
    add_conv("backbone.simfp_2.5", 32, 32, 3)
    sd["backbone.simfp_3.0.weight"] = rng2.randn(64, 32, 2, 2).astype(np.float32)
    sd["backbone.simfp_3.0.bias"] = rng2.randn(32).astype(np.float32)
    add_conv("backbone.simfp_3.1", 32, 32, 1)
    add_conv("backbone.simfp_3.2", 32, 32, 3)
    add_conv("backbone.simfp_4.0", 64, 32, 1)
    add_conv("backbone.simfp_4.1", 32, 32, 3)
    add_conv("backbone.simfp_5.1", 64, 32, 1)
    add_conv("backbone.simfp_5.2", 32, 32, 3)

    ported = port_torch_params(sd, backbone_type="EVA02")
    handler = _FailOnWarn()
    logger = logging.getLogger("portcheck2")
    logger.addHandler(handler)
    merged = merge_pretrained(
        {"params": dict(variables["params"])},
        {"params": {"vit": ported["params"]["backbone"]["vit"],
                    "sfp": ported["params"]["backbone"]["sfp"]}},
        logger=logger)
    assert not handler.records, handler.records
    out = model.apply({"params": merged["params"]}, jnp.zeros((1, 32, 64, 3)))
    assert all(np.isfinite(np.asarray(o)).all() for o in out)
