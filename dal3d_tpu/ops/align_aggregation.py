"""Feature alignment + aggregation ops (streaming-aggregation experiments).

TPU-native equivalent of det3d/ops/align_aggregation (CUDA `correlation` +
`alignfeature` extensions + `align_feature_and_aggregation.py`, unused by
the canonical configs but part of the reference op surface):

- ``local_correlation``: FlowNet-style K x K patch correlation between two
  NHWC maps (kernel 1, stride 1, unit patch dilation — the only settings the
  reference module uses), out[b, y, x, o] = <f1[b, y, x, :], f2 shifted by
  offset o>. Built as K*K statically-shifted views contracted over C — XLA
  fuses the shifts; no gather.
- ``align_feature``: per-pixel weighted blend of the K x K shifted
  neighborhood, align[b,y,x,c] = sum_o w[b,y,x,o] * feat_o[b,y,x,c]
  (the ``AlignFeature`` CUDA kernel).
- ``AlignFeatureAggregation``: the full torch module — embed convs,
  softmaxed correlation weights, alignment, and the shared-branch softmax
  blend of aligned + current features (Aggregation: conv tower applied with
  the SAME parameters to both inputs).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.layers import kaiming_conv_init

__all__ = ["local_correlation", "align_feature", "AlignFeatureAggregation"]


def _shifted_views(x: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, H, W, C] -> [K*K, B, H, W, C] of zero-padded shifted copies,
    offset o = (dy, dx) in row-major order over [-r, r]^2."""
    r = patch // 2
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)))
    views = [
        jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (B, H, W, C))
        for dy in range(patch) for dx in range(patch)
    ]
    return jnp.stack(views, axis=0)


def local_correlation(f1: jnp.ndarray, f2: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, H, W, C] x2 -> [B, H, W, patch*patch] patch correlation.

    Matches the reference CUDA kernel's normalization: the dot product is
    divided by the (kernel) patch element count, which is 1 for the
    kernel_size=1 configuration the module uses — i.e. a plain dot."""
    assert patch % 2 == 1, patch
    views = _shifted_views(f2, patch)  # [O, B, H, W, C]
    return jnp.einsum("bhwc,obhwc->bhwo", f1, views)


def align_feature(feat: jnp.ndarray, weights: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, H, W, C], [B, H, W, patch*patch] -> weighted neighborhood blend."""
    views = _shifted_views(feat, patch)  # [O, B, H, W, C]
    return jnp.einsum("bhwo,obhwc->bhwc", weights, views)


class AlignFeatureAggregation(nn.Module):
    """Align_Feature_and_Aggregation (align_feature_and_aggregation.py:31-60):
    embed both maps with 1x1 convs, softmax the local correlation into
    alignment weights, warp the keyframe features, then blend aligned vs
    current via a shared conv tower + 2-way softmax."""

    num_channel: int
    neighbor: int = 9

    @nn.compact
    def __call__(self, feature_select: jnp.ndarray, feature_current: jnp.ndarray):
        emb_s = nn.Conv(64, (1, 1), kernel_init=kaiming_conv_init(),
                        name="embed_keyframe")(feature_select)
        emb_c = nn.Conv(64, (1, 1), kernel_init=kaiming_conv_init(),
                        name="embed_current")(feature_current)
        w = local_correlation(emb_c, emb_s, self.neighbor)
        w = jax.nn.softmax(w, axis=-1)
        aligned = align_feature(feature_select, w, self.neighbor)

        # Aggregation: same conv parameters score both inputs
        conv1 = nn.Conv(64, (1, 1), kernel_init=kaiming_conv_init(), name="agg_conv1")
        conv2 = nn.Conv(32, (3, 3), padding=1, kernel_init=kaiming_conv_init(),
                        name="agg_conv2")
        conv3 = nn.Conv(1, (1, 1), kernel_init=kaiming_conv_init(), name="agg_conv3")

        def score(x):
            return conv3(conv2(conv1(x)))

        logits = jnp.concatenate([score(aligned), score(feature_current)], axis=-1)
        blend = jax.nn.softmax(logits, axis=-1)
        return blend[..., :1] * aligned + blend[..., 1:] * feature_current
