"""Shared model configuration and the U-Net trunk runner.

``ModelConfig`` is the immutable (hashable, jit-static-safe) subset of the hparams
dict that the networks consume — mirroring the keys the reference reads inside
``WT_PSE.__init__`` (``/root/reference/algorithms.py:1152-1157``) and
``ShapeVariationalDist_*``.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    n_channels: int = 3
    n_classes: int = 1
    base_width: int = 16  # 'n' in the reference
    feature_dim: int = 8
    shape_prior: bool = True
    shape_attention: bool = True
    cat_shape: bool = False
    shape_attention_coeffient: float = 0.3
    whitening: bool = True
    bn_axis_name: str | None = None
    # 'float32' (reference-parity; HIGHEST-precision convs) or 'bfloat16'
    # (mixed-precision training: bf16 conv compute on the MXU, f32 params,
    # f32 BN statistics and losses) — set via hparam `compute_dtype`
    compute_dtype: str | None = None
    # space-to-depth training (hparam `space_to_depth`): the whole top network
    # level runs on 2x2-pixel-packed tensors (4x channel/lane utilization;
    # exact kernel folding at apply time — see ops/packed.py). Train-path only;
    # eval/predict and checkpoints are layout-independent.
    s2d: bool = False
    # how many U-Net levels run packed when `s2d` (hparam
    # `space_to_depth_levels`): 1 = top level only (256²/16ch); 2 = also the
    # second level (128²/32ch -> 64²/128ch, full MXU/VPU lane utilization);
    # 3 = also the third (64²/64ch -> 32²/256ch). Same exact-folding machinery
    # at every level; the flag cascade in `unet_run` is regular per level.
    # On-chip: 2 is fastest (hparams.py registry note); 3 regresses.
    s2d_levels: int = 2

    @classmethod
    def from_hparams(cls, hparams: dict, n_channels: int = 3, n_classes: int = 1,
                     bn_axis_name: str | None = None) -> "ModelConfig":
        dtype = hparams.get("compute_dtype", None)
        return cls(
            n_channels=n_channels,
            n_classes=n_classes,
            shape_prior=bool(hparams.get("shape_prior", True)),
            shape_attention=bool(hparams.get("shape_attention", True)),
            cat_shape=bool(hparams.get("cat_shape", False)),
            shape_attention_coeffient=float(hparams.get("shape_attention_coeffient", 0.3)),
            whitening=bool(hparams.get("whitening", True)),
            bn_axis_name=bn_axis_name,
            compute_dtype=None if dtype in (None, "float32") else str(dtype),
            s2d=bool(hparams.get("space_to_depth", False)),
            s2d_levels=int(hparams.get("space_to_depth_levels", 2)),
        )


def unet_run(m, x1, train: bool, packed: bool = False):
    """Run the shared 5-level encoder/decoder trunk given a module ``m`` exposing
    down1..down4 / up1..up4 (reference trunk: ``algorithms.py:1218-1226``).

    Returns the final 2n-channel decoder feature map at input resolution.
    ``packed=True``: ``x1`` is a space-to-depth tensor; down1's entry pool
    unpacks it (phase-max) so levels 2+ run unpacked at their native sizes,
    and up4 re-enters packed layout through its upsample (result is packed).
    With ``m.cfg.s2d_levels >= 2`` the second level also runs packed: down1
    re-packs its pooled input and emits a packed ``x2``; down2's entry
    phase-max consumes it; up3 emits the level-2 map packed (packed skip
    concat is layout-valid — channel-major phases); up4's conv1 runs folded
    before unpacking into its own upsample. ``>= 3`` applies the identical
    cascade one level further (down2 repacks, down3 unpools, up2 emits
    packed, up3's conv1 runs folded).
    """
    lv = getattr(m.cfg, "s2d_levels", 1) if packed else 0
    l2, l3 = lv >= 2, lv >= 3
    x2 = m.down1(x1, train, packed_input=packed, repack_input=l2)
    x3 = m.down2(x2, train, packed_input=l2, repack_input=l3)
    x4 = m.down3(x3, train, packed_input=l3)
    x5 = m.down4(x4, train)
    x = m.up1(x5, x4, train)
    x = m.up2(x, x3, train, packed_out=l3)
    x = m.up3(x, x2, train, packed_out=l2, packed_input=l3)
    x = m.up4(x, x1, train, packed_out=packed, packed_input=l2)
    return x


def attention_fuse(cfg, attention_layer, embedding, z_posterior,
                   packed: bool = False):
    """Attention-gated fusion shared by WTPSE and JointShapeReg
    (algorithms.py:1241-1253): ``coef*emb + attn*emb``, optional ``cat_shape``
    concat. Returns (fused embedding, attention map or None). Called from
    inside the owning module's method so ``attention_layer`` binds normally.
    """
    import jax.numpy as jnp

    if cfg.shape_attention:
        att, _ = attention_layer(z_posterior, packed)
        if packed:
            from wt_pse_tpu.ops.packed import pbroadcast_mul

            fused = cfg.shape_attention_coeffient * embedding \
                + pbroadcast_mul(embedding, att)
        else:
            fused = cfg.shape_attention_coeffient * embedding + att * embedding
    else:
        att = None
        fused = embedding
    if cfg.cat_shape:
        fused = jnp.concatenate([fused, z_posterior], axis=-1)
    return fused, att
