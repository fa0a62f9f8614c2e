"""Residual ground-box coder (reference: det3d/core/bbox/box_coders.py:32,100).

``GroundBox3dCoder(n_dim=9, vec_encode=True)`` -> code_size 10: the canonical
CBGS configuration (x,y,z,w,l,h,vx,vy residuals + (cos,sin) angle vector).
Provides both numpy (host pipeline) and JAX (device) encode/decode.
"""
from __future__ import annotations

from . import box_np_ops, box_ops_jax


class GroundBox3dCoder:
    def __init__(self, vec_encode: bool = False, linear_dim: bool = False, n_dim: int = 7, **kwargs):
        self.linear_dim = linear_dim
        self.vec_encode = vec_encode
        self.n_dim = n_dim

    @property
    def code_size(self) -> int:
        return self.n_dim + 1 if self.vec_encode else self.n_dim

    # host (numpy)
    def encode(self, boxes, anchors):
        return box_np_ops.second_box_encode(
            boxes, anchors, encode_angle_to_vector=self.vec_encode, smooth_dim=self.linear_dim
        )

    def decode(self, encodings, anchors):
        return box_np_ops.second_box_decode(
            encodings, anchors, encode_angle_to_vector=self.vec_encode, smooth_dim=self.linear_dim
        )

    # device (jax)
    def encode_jax(self, boxes, anchors):
        return box_ops_jax.second_box_encode(
            boxes, anchors, encode_angle_to_vector=self.vec_encode, smooth_dim=self.linear_dim
        )

    def decode_jax(self, encodings, anchors):
        return box_ops_jax.second_box_decode(
            encodings, anchors, encode_angle_to_vector=self.vec_encode, smooth_dim=self.linear_dim
        )


def build_box_coder(cfg: dict):
    """Builder mirroring the reference's string-keyed coder factory
    (det3d/builder.py:399)."""
    cfg = dict(cfg)
    coder_type = cfg.pop("type")
    if coder_type in ("ground_box3d_coder", "GroundBox3dCoder"):
        return GroundBox3dCoder(
            vec_encode=cfg.get("encode_angle_vector", False),
            linear_dim=cfg.get("linear_dim", False),
            n_dim=cfg.get("n_dim", 7),
        )
    raise ValueError(f"unknown box coder: {coder_type}")
