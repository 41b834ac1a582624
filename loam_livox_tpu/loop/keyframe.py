"""Keyframe place-recognition descriptors — TPU re-design of
`Maps_keyframe` (reference: ``source/cell_map_keyframe.hpp:1002-1624``).

A keyframe is the set of cells its frames touched.  Its descriptor is a
pair of rotation-invariant 2D spherical histograms (60×60 — the
reference's ``PHI/THETA_RESOLUTION``, ``:35-36``) of the line/plane
feature directions of those cells:

1. per-cell eigendecomposition classifies line/plane and yields a
   direction (`map.cell_features`),
2. the plane directions' second-moment eigenvectors give a canonical
   rotation (descending eigenvalue order, right-handed — reference
   ``generate_feature_img``/:1385-1427, ``eigen_decompose_of_featurevector``),
3. each direction is rotated into that frame, sign-canonicalized
   (x ≥ 0), binned by (φ, θ) (reference ``feature_direction``
   :1072-1090), histogrammed, and Gaussian-blurred with spherical wrap
   padding (reference ``apply_guassian_blur`` :1358-1370),
4. similarity of two keyframes = max of normalized cross-correlation
   (OpenCV ``matchTemplate`` CCORR_NORMED) of one image over the other
   wrap-padded by half its size (reference
   ``max_similiarity_of_two_image`` :1157-1229) — expressed here as an
   XLA convolution.

Everything is fixed-shape: the cell set is a boolean mask over the
cell-map directory, histograms are (60, 60) arrays, the correlation is
one conv.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..map.cell_map import FEATURE_LINE, FEATURE_PLANE, CellMap, cell_features
from ..ops.masked import masked_quantile_l1

PHI_RESOLUTION = 60    # reference cell_map_keyframe.hpp:35
THETA_RESOLUTION = 60  # reference cell_map_keyframe.hpp:36


class KeyframeDescriptor(NamedTuple):
    img_line: jax.Array          # (60, 60) blurred histogram
    img_plane: jax.Array         # (60, 60)
    img_line_roi: jax.Array      # ROI variants (cells within roi_range)
    img_plane_roi: jax.Array
    ratio_nonzero_line: jax.Array    # pre-blur nonzero ratios (:1140-1154)
    ratio_nonzero_plane: jax.Array
    center: jax.Array            # (3,) mean of member cell centers
    roi_range: jax.Array         # 0.90-quantile center distance (:1304-1319)
    n_cells: jax.Array           # member cell count
    n_line: jax.Array
    n_plane: jax.Array


def _gaussian_kernel_2d(ksize: int, sigma: float):
    """OpenCV-compatible separable Gaussian kernel, (2k+1, 2k+1)."""
    half = ksize
    x = jnp.arange(-half, half + 1, dtype=jnp.float32)
    g = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    g = g / jnp.sum(g)
    return g[:, None] * g[None, :]


def _wrap_pad(img: jax.Array, py: int, px: int) -> jax.Array:
    """Torus wrap padding, matching `add_padding_to_feature_image`
    (reference :1321-1356: blocks copied from the opposite side)."""
    top = img[-py:, :]
    bot = img[:py, :]
    v = jnp.concatenate([top, img, bot], axis=0)
    left = v[:, -px:]
    right = v[:, :px]
    return jnp.concatenate([left, v, right], axis=1)


def _blur(img: jax.Array, ksize: int = 4, sigma: float = 4.0) -> jax.Array:
    """Gaussian blur with wrap padding (reference :1358-1370)."""
    k = _gaussian_kernel_2d(ksize, sigma)
    padded = _wrap_pad(img, ksize, ksize)
    out = lax.conv_general_dilated(
        padded[None, None, :, :], k[None, None, :, :],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0, 0]


def _feature_direction_bins(vecs: jax.Array):
    """(φ, θ) bin indices per direction (reference `feature_direction`,
    :1072-1090): flip to x ≥ 0, φ = atan2(y, x) + π/2, θ = asin(z) + π/2,
    floor-binned over π ranges."""
    flip = vecs[:, 0] < 0
    v = jnp.where(flip[:, None], -vecs, vecs)
    nrm = jnp.linalg.norm(v, axis=-1)
    vz = jnp.where(nrm[:, None] > 1e-9, v / jnp.maximum(nrm, 1e-9)[:, None], 0.0)
    phi = jnp.arctan2(vz[:, 1], vz[:, 0]) + jnp.pi / 2
    theta = jnp.arcsin(jnp.clip(vz[:, 2], -1.0, 1.0)) + jnp.pi / 2
    phi_idx = jnp.clip(jnp.floor(phi / (jnp.pi / PHI_RESOLUTION)),
                       0, PHI_RESOLUTION - 1).astype(jnp.int32)
    theta_idx = jnp.clip(jnp.floor(theta / (jnp.pi / THETA_RESOLUTION)),
                         0, THETA_RESOLUTION - 1).astype(jnp.int32)
    return phi_idx, theta_idx


def _hist_image(vecs: jax.Array, mask: jax.Array, rot: jax.Array):
    """Blurred (60, 60) histogram of rotated directions + pre-blur
    nonzero ratio (reference `generate_feature_img`, :1385-1427)."""
    v = vecs @ rot  # R^T · vec per row
    pi_, ti_ = _feature_direction_bins(v)
    flat = jnp.where(mask, pi_ * THETA_RESOLUTION + ti_,
                     PHI_RESOLUTION * THETA_RESOLUTION)
    img = jnp.zeros((PHI_RESOLUTION * THETA_RESOLUTION,), jnp.float32)
    img = img.at[flat].add(jnp.where(mask, 1.0, 0.0), mode="drop")
    img = img.reshape(PHI_RESOLUTION, THETA_RESOLUTION)
    nonzero = jnp.mean((img >= 1.0).astype(jnp.float32))
    return _blur(img), nonzero


def _alignment_rotation(vecs: jax.Array, mask: jax.Array) -> jax.Array:
    """Canonical rotation from the plane directions' second moment
    (reference `eigen_decompose_of_featurevector` :1553-1567 +
    reordering in `generate_feature_img` :1389-1393)."""
    w = mask.astype(jnp.float32)
    M = jnp.einsum("n,ni,nj->ij", w, vecs, vecs)
    _, vec = jnp.linalg.eigh(M)          # ascending
    vec = vec[:, ::-1]                   # descending
    c2 = jnp.cross(vec[:, 0], vec[:, 1])
    return jnp.stack([vec[:, 0], vec[:, 1], c2], axis=1)


@partial(jax.jit, static_argnames=("incremental",))
def describe_keyframe(m: CellMap, member: jax.Array,
                      incremental: bool = True) -> KeyframeDescriptor:
    """Descriptor of the keyframe whose member cells are flagged by the
    (C,) boolean `member` over the cell-map directory (reference
    `analyze` → `extract_feature_mapping_new`, :1429-1494).
    `incremental` = common/if_update_mean_and_cov_incrementally."""
    feats = cell_features(m, incremental=incremental)
    member = member & m.valid()
    centers = m.centers()

    nc = jnp.maximum(jnp.sum(member.astype(jnp.float32)), 1.0)
    center = jnp.sum(jnp.where(member[:, None], centers, 0.0), axis=0) / nc
    d = jnp.linalg.norm(centers - center, axis=-1)
    # 0.90-quantile of member distances (reference ratio=0.90, :1438;
    # get_ratio_range_of_cell dedups distances in a std::set — measure
    # zero for float distances)
    roi_range = masked_quantile_l1(d, member, 0.90)

    is_line = member & (feats.feature_type == FEATURE_LINE)
    is_plane = member & (feats.feature_type == FEATURE_PLANE)
    in_roi = member & (d < roi_range)

    rot = _alignment_rotation(feats.feature_dir, is_plane)
    rot_roi = _alignment_rotation(feats.feature_dir, is_plane & in_roi)

    img_line, rz_line = _hist_image(feats.feature_dir, is_line, rot)
    img_plane, rz_plane = _hist_image(feats.feature_dir, is_plane, rot)
    img_line_roi, _ = _hist_image(feats.feature_dir, is_line & in_roi, rot_roi)
    img_plane_roi, _ = _hist_image(feats.feature_dir, is_plane & in_roi,
                                   rot_roi)

    return KeyframeDescriptor(
        img_line=img_line,
        img_plane=img_plane,
        img_line_roi=img_line_roi,
        img_plane_roi=img_plane_roi,
        ratio_nonzero_line=rz_line,
        ratio_nonzero_plane=rz_plane,
        center=center,
        roi_range=roi_range,
        n_cells=jnp.sum(member.astype(jnp.int32)),
        n_line=jnp.sum(is_line.astype(jnp.int32)),
        n_plane=jnp.sum(is_plane.astype(jnp.int32)),
    )


@jax.jit
def max_similarity(img_a: jax.Array, img_b: jax.Array) -> jax.Array:
    """Max normalized cross-correlation of `img_a` slid over `img_b`
    wrap-padded by half the resolution — the reference's
    ``matchTemplate(..., CV_TM_CCORR_NORMED)`` over
    ``add_padding_to_feature_image(img_b, 30, 30)`` (reference
    :1196-1199, 1211-1229)."""
    ph, pw = PHI_RESOLUTION // 2, THETA_RESOLUTION // 2
    b = _wrap_pad(img_b, ph, pw)

    num = lax.conv_general_dilated(
        b[None, None], img_a[None, None], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]
    ones = jnp.ones_like(img_a)
    b2 = lax.conv_general_dilated(
        (b * b)[None, None], ones[None, None], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]
    a2 = jnp.sum(img_a * img_a)
    ncc = num / jnp.sqrt(jnp.maximum(b2 * a2, 1e-12))
    return jnp.max(ncc)
