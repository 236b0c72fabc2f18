"""Neural building blocks (Flax linen), with torch-compatible initialization
and semantics so reference checkpoints port 1:1.

Provides the slice of mmcv blocks the reference exercises
(/root/reference/models/sparsebev_transformer.py:7): MultiheadAttention with
additive float masks + residual, FFN with residual, plus torch-default
initializers shared by every Linear in the model.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)).

    Flax Dense kernels are [in, out], so fan_in = shape[0].
    """
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Linear(nn.Module):
    """nn.Dense with torch-default init (so from-scratch training matches the
    reference's initialization statistics)."""

    features: int
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel_init = self.kernel_init or torch_linear_kernel_init
        bias_init = self.bias_init or torch_linear_bias_init(in_features)
        return nn.Dense(self.features, use_bias=self.use_bias,
                        kernel_init=kernel_init, bias_init=bias_init,
                        dtype=self.dtype, name="linear")(x)


class LayerNorm(nn.Module):
    """LayerNorm over the last dim, torch eps default."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.epsilon, name="ln")(x)


def layer_norm_nd(x: jnp.ndarray, num_dims: int, eps: float = 1e-5) -> jnp.ndarray:
    """F.layer_norm over the trailing ``num_dims`` dims with NO learned affine
    (used by AdaptiveMixing, models/sparsebev_transformer.py:368,373).
    Statistics are computed in fp32 regardless of input dtype."""
    axes = tuple(range(x.ndim - num_dims, x.ndim))
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=axes, keepdims=True)
    var = jnp.var(x32, axis=axes, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class MultiheadAttention(nn.Module):
    """torch nn.MultiheadAttention semantics (batch_first) + mmcv residual.

    - packed qkv projection (``in_proj``) and ``out_proj`` like torch, so
      checkpoint keys map directly;
    - ``attn_mask``: additive float mask ``[B*H, Q, K]`` (or bool: True =
      blocked), added to the pre-softmax logits;
    - mmcv's wrapper adds the residual: ``out = query + dropout(attn_out)``
      (mmcv MultiheadAttention.forward).
    """

    embed_dims: int
    num_heads: int
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, query, key=None, value=None, attn_mask=None,
                 identity=None, deterministic: bool = True):
        c = self.embed_dims
        h = self.num_heads
        hd = c // h
        key = query if key is None else key
        value = key if value is None else value
        identity = query if identity is None else identity
        b, q_len, _ = query.shape
        k_len = key.shape[1]
        cdt = self.dtype or query.dtype

        in_proj_w = self.param("in_proj_weight", torch_linear_kernel_init, (c, 3 * c))
        in_proj_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * c,))
        wq, wk, wv = jnp.split(in_proj_w.astype(cdt), 3, axis=1)
        bq, bk, bv = jnp.split(in_proj_b.astype(cdt), 3)

        q = query.astype(cdt) @ wq + bq
        k = key.astype(cdt) @ wk + bk
        v = value.astype(cdt) @ wv + bv

        q = q.reshape(b, q_len, h, hd).transpose(0, 2, 1, 3)  # [B, H, Q, hd]
        k = k.reshape(b, k_len, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, k_len, h, hd).transpose(0, 2, 1, 3)

        # logits in fp32 (additive masks carry -inf; softmax stays exact)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / math.sqrt(hd)
        if attn_mask is not None:
            if attn_mask.dtype == jnp.bool_:
                bias = jnp.where(attn_mask, -jnp.inf, 0.0)
            else:
                bias = attn_mask.astype(jnp.float32)
            logits = logits + bias.reshape(b, h, q_len, k_len)

        attn = jax.nn.softmax(logits, axis=-1)
        attn = nn.Dropout(self.dropout, name="attn_drop")(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(cdt), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, q_len, c)
        out = Linear(c, dtype=self.dtype, name="out_proj")(out)
        # mmcv wrapper: proj_drop + residual
        out = nn.Dropout(self.dropout, name="proj_drop")(out, deterministic=deterministic)
        return identity + out


class FFN(nn.Module):
    """mmcv FFN: Linear -> ReLU -> drop -> Linear -> drop, + residual."""

    embed_dims: int
    feedforward_channels: int = 512
    ffn_drop: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = Linear(self.feedforward_channels, dtype=self.dtype, name="fc1")(x)
        y = nn.relu(y)
        y = nn.Dropout(self.ffn_drop, name="drop1")(y, deterministic=deterministic)
        y = Linear(self.embed_dims, dtype=self.dtype, name="fc2")(y)
        y = nn.Dropout(self.ffn_drop, name="drop2")(y, deterministic=deterministic)
        return x + y


class MLP(nn.Module):
    """Sequence of Linear(+LayerNorm)(+ReLU) blocks ending in a plain Linear.

    Covers the cls/reg branches and the position encoder patterns
    (models/sparsebev_transformer.py:113-144).
    """

    hidden_dims: Sequence[int]
    out_dim: int
    with_ln: bool = True
    final_bias_init: Optional[float] = None

    @nn.compact
    def __call__(self, x):
        for i, dim in enumerate(self.hidden_dims):
            x = Linear(dim, name=f"fc{i}")(x)
            if self.with_ln:
                x = nn.LayerNorm(epsilon=1e-5, name=f"ln{i}")(x)
            x = nn.relu(x)
        bias_init = (nn.initializers.constant(self.final_bias_init)
                     if self.final_bias_init is not None else None)
        return Linear(self.out_dim, bias_init=bias_init, name="out")(x)


def bias_init_with_prob(prior_prob: float) -> float:
    """mmcv bias_init_with_prob: focal-style classifier bias."""
    return float(-math.log((1 - prior_prob) / prior_prob))
