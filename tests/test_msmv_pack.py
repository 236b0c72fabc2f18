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
