"""Converter rules for the NR quality networks (MANIQA, MUSIQ).

MANIQA keys follow the official IIGROUP/MANIQA checkpoints the reference's
pyiqa scorer downloads (ckpt_koniq10k.pt: ``vit.*`` timm ViT-B/8 names +
``tablock1/conv1/swintransformer1/...`` head names). MUSIQ keys follow the
flat module names of the Flax port (see iqa/musiq.py port caveats).
"""

from __future__ import annotations

from .torch_import import Rule, t_conv, t_id, t_linear


def _vit_rules(prefix: str = r"vit", dst: str = "vit") -> list[Rule]:
    B = rf"{prefix}\.blocks\.(\d+)"
    D = rf"{dst}/block\1"
    return [
        (rf"{prefix}\.cls_token", rf"{dst}/cls_token", t_id),
        (rf"{prefix}\.pos_embed", rf"{dst}/pos_embed", t_id),
        (rf"{prefix}\.patch_embed\.proj\.weight",
         rf"{dst}/patch_embed/kernel", t_conv),
        (rf"{prefix}\.patch_embed\.proj\.bias",
         rf"{dst}/patch_embed/bias", t_id),
        (rf"{B}\.norm1\.weight", rf"{D}/norm1/scale", t_id),
        (rf"{B}\.norm1\.bias", rf"{D}/norm1/bias", t_id),
        (rf"{B}\.attn\.qkv\.weight", rf"{D}/qkv/kernel", t_linear),
        (rf"{B}\.attn\.qkv\.bias", rf"{D}/qkv/bias", t_id),
        (rf"{B}\.attn\.proj\.weight", rf"{D}/proj/kernel", t_linear),
        (rf"{B}\.attn\.proj\.bias", rf"{D}/proj/bias", t_id),
        (rf"{B}\.norm2\.weight", rf"{D}/norm2/scale", t_id),
        (rf"{B}\.norm2\.bias", rf"{D}/norm2/bias", t_id),
        (rf"{B}\.mlp\.fc1\.weight", rf"{D}/mlp/fc1/kernel", t_linear),
        (rf"{B}\.mlp\.fc1\.bias", rf"{D}/mlp/fc1/bias", t_id),
        (rf"{B}\.mlp\.fc2\.weight", rf"{D}/mlp/fc2/kernel", t_linear),
        (rf"{B}\.mlp\.fc2\.bias", rf"{D}/mlp/fc2/bias", t_id),
        # final norm / classifier head: not consumed by MANIQA's feature
        # taps (blocks 6..9 are read pre-final-norm)
        (rf"{prefix}\.norm\.(weight|bias)", "", t_id),
        (rf"{prefix}\.head\.(weight|bias)", "", t_id),
    ]


def maniqa_rules() -> list[Rule]:
    rules: list[Rule] = list(_vit_rules())
    for tb in ("tablock1", "tablock2"):
        for lin in ("c_q", "c_k", "c_v"):
            rules += [
                (rf"{tb}\.(\d+)\.{lin}\.weight",
                 rf"{tb}_\1/{lin}/kernel", t_linear),
                (rf"{tb}\.(\d+)\.{lin}\.bias",
                 rf"{tb}_\1/{lin}/bias", t_id),
            ]
    rules += [
        (r"conv1\.weight", r"conv1/kernel", t_conv),
        (r"conv1\.bias", r"conv1/bias", t_id),
        (r"conv2\.weight", r"conv2/kernel", t_conv),
        (r"conv2\.bias", r"conv2/bias", t_id),
    ]
    for si in (1, 2):
        S = rf"swintransformer{si}\.layers\.(\d+)\.blocks\.(\d+)"
        D = rf"swin{si}/layer\1_block\2"
        rules += [
            (rf"{S}\.norm1\.weight", rf"{D}/norm1/scale", t_id),
            (rf"{S}\.norm1\.bias", rf"{D}/norm1/bias", t_id),
            (rf"{S}\.attn\.relative_position_bias_table",
             rf"{D}/relative_position_bias_table", t_id),
            (rf"{S}\.attn\.relative_position_index", "", t_id),
            (rf"{S}\.attn\.qkv\.weight", rf"{D}/qkv/kernel", t_linear),
            (rf"{S}\.attn\.qkv\.bias", rf"{D}/qkv/bias", t_id),
            (rf"{S}\.attn\.proj\.weight", rf"{D}/proj/kernel", t_linear),
            (rf"{S}\.attn\.proj\.bias", rf"{D}/proj/bias", t_id),
            (rf"{S}\.norm2\.weight", rf"{D}/norm2/scale", t_id),
            (rf"{S}\.norm2\.bias", rf"{D}/norm2/bias", t_id),
            (rf"{S}\.mlp\.fc1\.weight", rf"{D}/fc1/kernel", t_linear),
            (rf"{S}\.mlp\.fc1\.bias", rf"{D}/fc1/bias", t_id),
            (rf"{S}\.mlp\.fc2\.weight", rf"{D}/fc2/kernel", t_linear),
            (rf"{S}\.mlp\.fc2\.bias", rf"{D}/fc2/bias", t_id),
            (rf"{S}\.attn_mask", "", t_id),
            (rf"swintransformer{si}\.layers\.\d+\.blocks\.\d+\."
             r"attn\.relative_position_index", "", t_id),
        ]
    # head Sequentials: Linear@0, ReLU, Dropout, Linear@3
    for head in ("fc_score", "fc_weight"):
        rules += [
            (rf"{head}\.0\.weight", rf"{head}0/kernel", t_linear),
            (rf"{head}\.0\.bias", rf"{head}0/bias", t_id),
            (rf"{head}\.3\.weight", rf"{head}1/kernel", t_linear),
            (rf"{head}\.3\.bias", rf"{head}1/bias", t_id),
        ]
    return rules


def musiq_rules() -> list[Rule]:
    rules: list[Rule] = [
        (r"patch_proj\.weight", r"patch_proj/kernel", t_linear),
        (r"patch_proj\.bias", r"patch_proj/bias", t_id),
        (r"hse_embedding", r"hse_embedding", t_id),
        (r"scale_embedding", r"scale_embedding", t_id),
        (r"cls_token", r"cls_token", t_id),
        (r"norm\.weight", r"norm/scale", t_id),
        (r"norm\.bias", r"norm/bias", t_id),
        (r"head\.weight", r"head/kernel", t_linear),
        (r"head\.bias", r"head/bias", t_id),
    ]
    B, D = r"blocks\.(\d+)", r"block\1"
    rules += [
        (rf"{B}\.norm1\.weight", rf"{D}/norm1/scale", t_id),
        (rf"{B}\.norm1\.bias", rf"{D}/norm1/bias", t_id),
        (rf"{B}\.attn\.qkv\.weight", rf"{D}/qkv/kernel", t_linear),
        (rf"{B}\.attn\.qkv\.bias", rf"{D}/qkv/bias", t_id),
        (rf"{B}\.attn\.proj\.weight", rf"{D}/proj/kernel", t_linear),
        (rf"{B}\.attn\.proj\.bias", rf"{D}/proj/bias", t_id),
        (rf"{B}\.norm2\.weight", rf"{D}/norm2/scale", t_id),
        (rf"{B}\.norm2\.bias", rf"{D}/norm2/bias", t_id),
        (rf"{B}\.mlp\.fc1\.weight", rf"{D}/mlp/fc1/kernel", t_linear),
        (rf"{B}\.mlp\.fc1\.bias", rf"{D}/mlp/fc1/bias", t_id),
        (rf"{B}\.mlp\.fc2\.weight", rf"{D}/mlp/fc2/kernel", t_linear),
        (rf"{B}\.mlp\.fc2\.bias", rf"{D}/mlp/fc2/bias", t_id),
    ]
    return rules
