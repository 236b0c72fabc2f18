"""Pallas pack kernel == XLA pack formulation (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from sparsebev_tpu.ops.msmv_pack_pallas import (_pack_level_xla,
                                                pack_level, pack_level_tpu)


def test_pack_kernel_matches_xla(rng):
    for m, h, w, c, g in [(3, 16, 12, 8, 4), (2, 32, 7, 16, 4), (1, 16, 5, 6, 2)]:
        feat = jnp.asarray(rng.randn(m, h, w, c).astype(np.float32))
        want = _pack_level_xla(feat, g)
        got = pack_level_tpu(feat, g, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=0)


def test_pack_vjp_matches_xla(rng):
    m, h, w, c, g = 2, 16, 6, 8, 4
    feat = jnp.asarray(rng.randn(m, h, w, c).astype(np.float32))

    def loss_custom(f):
        return jnp.sum(pack_level(f, g) ** 3)

    def loss_xla(f):
        return jnp.sum(_pack_level_xla(f, g) ** 3)

    ga = jax.grad(loss_custom)(feat)
    gb = jax.grad(loss_xla)(feat)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=1e-6, atol=1e-6)


def test_mixing_pallas_interpret_matches_xla(rng):
    """Experimental fused-mixing kernel (ops/mixing_pallas.py): the
    interpret-mode kernel must equal the XLA formulation exactly, including
    the bq padding path; grads flow through the XLA bwd of the custom_vjp."""
    import jax
    import jax.numpy as jnp
    from sparsebev_tpu.ops.mixing_pallas import (_mixing_core_xla,
                                                 mixing_core,
                                                 mixing_core_tpu)
    bq, g, p, c, o = 21, 4, 32, 64, 128  # 21*4 exercises block padding
    x = jnp.asarray(rng.randn(bq, g, p, c).astype(np.float32))
    m = jnp.asarray(rng.randn(bq, g, c, c).astype(np.float32) * 0.1)
    s = jnp.asarray(rng.randn(bq, g, o, p).astype(np.float32) * 0.1)
    a = mixing_core_tpu(x, m, s, interpret=True)
    b = _mixing_core_xla(x, m, s)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
    grads = jax.grad(lambda *t: mixing_core(*t).sum(), argnums=(0, 1, 2))(
        x, m, s)
    assert all(bool(jnp.isfinite(t).all()) for t in grads)


def test_pack_level_tiny_and_odd_heights(rng):
    """Regression: 1-row levels (stride-32 of a 32-px image, hit by the
    smoke config on TPU) and odd heights must pack exactly — the kernel's
    intra-block row shift is skipped for 1-row blocks."""
    from sparsebev_tpu.ops.msmv_pack_pallas import (_pack_level_xla,
                                                    pack_level_tpu)
    for h, w in [(1, 2), (2, 4), (3, 5)]:
        feat = jnp.asarray(rng.randn(6, h, w, 64).astype(np.float32))
        out = pack_level_tpu(feat, 4, interpret=True)
        want = _pack_level_xla(feat, 4).reshape(out.shape)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=1e-6)


def test_pack_pair_kernel_matches_xla(rng):
    from sparsebev_tpu.ops.msmv_pack_pallas import (_pack_pair_xla,
                                                    pack_level_pair_tpu)
    for m, h, w, c, g in [(3, 16, 12, 8, 4), (2, 32, 7, 16, 4),
                          (1, 1, 5, 6, 2), (2, 9, 5, 6, 2)]:
        feat = jnp.asarray(rng.randn(m, h, w, c).astype(np.float32))
        want = _pack_pair_xla(feat, g)
        got = pack_level_pair_tpu(feat, g, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=0)


def test_pack_pair_vjp_matches_xla(rng):
    from sparsebev_tpu.ops.msmv_pack_pallas import (_pack_pair_xla,
                                                    pack_level_pair)
    m, h, w, c, g = 2, 16, 6, 8, 4
    feat = jnp.asarray(rng.randn(m, h, w, c).astype(np.float32))
    ga = jax.grad(lambda f: jnp.sum(pack_level_pair(f, g) ** 3))(feat)
    gb = jax.grad(lambda f: jnp.sum(_pack_pair_xla(f, g) ** 3))(feat)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=1e-6, atol=1e-6)
