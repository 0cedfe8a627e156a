"""Generate torch state-dict key+shape manifests for the published SD models.

These manifests are the golden structural reference for offline conversion
parity (diffusers is not installed in the build environment).  They are
authored from the *published* diffusers model layouts — the construction
rules of `UNet2DConditionModel` / `AutoencoderKL` / transformers
`CLIPTextModel` as serialized on the HF hub for SD1.5 / SD2.1-base — and are
deliberately INDEPENDENT of textboost_tpu.models.convert: the test
(tests/test_golden_parity.py) asserts that convert's eval_shape-driven
manifest agrees with these files key-for-key and shape-for-shape.

Reference stacks being mirrored:
  UNet: diffusers UNet2DConditionModel (SD1.5 config: block_out_channels
    (320,640,1280,1280), layers_per_block 2, 3x CrossAttnDownBlock2D +
    DownBlock2D, attention_head_dim 8, cross_attention_dim 768; SD2.1-base:
    attention_head_dim (5,10,20,20), cross 1024, use_linear_projection).
  VAE: diffusers AutoencoderKL (block_out_channels (128,256,512,512),
    layers_per_block 2, latent 4) — modern `to_q/to_k/to_v/to_out.0`
    attention naming (diffusers >= 0.17 remaps the legacy names at load).
  CLIP: transformers CLIPTextModel (SD1.5: 768/12L/12H quick_gelu;
    SD2.1-base: 1024/23L/16H gelu).

Run from repo root:  python tests/fixtures/generate_manifests.py
"""
import os

HERE = os.path.dirname(os.path.abspath(__file__))


def emit(name, entries):
    path = os.path.join(HERE, name + ".manifest")
    with open(path, "w") as f:
        for key in sorted(entries):
            f.write(f"{key} {','.join(str(d) for d in entries[key])}\n")
    print(f"wrote {path} ({len(entries)} keys)")


# ---------------------------------------------------------------------------
# building blocks (torch-side shapes: Linear [out,in], Conv [out,in,kh,kw])
# ---------------------------------------------------------------------------
def linear(d, prefix, out_f, in_f, bias=True):
    d[f"{prefix}.weight"] = (out_f, in_f)
    if bias:
        d[f"{prefix}.bias"] = (out_f,)


def conv(d, prefix, out_c, in_c, k):
    d[f"{prefix}.weight"] = (out_c, in_c, k, k)
    d[f"{prefix}.bias"] = (out_c,)


def norm(d, prefix, c):
    d[f"{prefix}.weight"] = (c,)
    d[f"{prefix}.bias"] = (c,)


def resnet(d, prefix, in_c, out_c, temb_dim=None):
    norm(d, f"{prefix}.norm1", in_c)
    conv(d, f"{prefix}.conv1", out_c, in_c, 3)
    if temb_dim:
        linear(d, f"{prefix}.time_emb_proj", out_c, temb_dim)
    norm(d, f"{prefix}.norm2", out_c)
    conv(d, f"{prefix}.conv2", out_c, out_c, 3)
    if in_c != out_c:
        conv(d, f"{prefix}.conv_shortcut", out_c, in_c, 1)


def transformer2d(d, prefix, ch, cross_dim, linear_proj):
    norm(d, f"{prefix}.norm", ch)  # GroupNorm
    if linear_proj:
        linear(d, f"{prefix}.proj_in", ch, ch)
        linear(d, f"{prefix}.proj_out", ch, ch)
    else:
        conv(d, f"{prefix}.proj_in", ch, ch, 1)
        conv(d, f"{prefix}.proj_out", ch, ch, 1)
    b = f"{prefix}.transformer_blocks.0"
    # self-attention: qkv over ch, no bias; out proj with bias
    for p in ("to_q", "to_k", "to_v"):
        linear(d, f"{b}.attn1.{p}", ch, ch, bias=False)
    linear(d, f"{b}.attn1.to_out.0", ch, ch)
    # cross-attention: k/v read the text states
    linear(d, f"{b}.attn2.to_q", ch, ch, bias=False)
    linear(d, f"{b}.attn2.to_k", ch, cross_dim, bias=False)
    linear(d, f"{b}.attn2.to_v", ch, cross_dim, bias=False)
    linear(d, f"{b}.attn2.to_out.0", ch, ch)
    # GEGLU feed-forward: net.0.proj -> 2*(4*ch), net.2 -> ch
    linear(d, f"{b}.ff.net.0.proj", ch * 8, ch)
    linear(d, f"{b}.ff.net.2", ch, ch * 4)
    norm(d, f"{b}.norm1", ch)
    norm(d, f"{b}.norm2", ch)
    norm(d, f"{b}.norm3", ch)


def unet_manifest(block_out, cross_dim, linear_proj):
    d = {}
    c0 = block_out[0]
    temb = c0 * 4
    layers = 2
    n = len(block_out)
    conv(d, "conv_in", c0, 4, 3)
    linear(d, "time_embedding.linear_1", temb, c0)
    linear(d, "time_embedding.linear_2", temb, temb)

    # down: 3x CrossAttnDownBlock2D + DownBlock2D
    for i, out_c in enumerate(block_out):
        in_c = block_out[i - 1] if i > 0 else c0
        has_attn = i < n - 1
        for j in range(layers):
            resnet(d, f"down_blocks.{i}.resnets.{j}", in_c if j == 0 else out_c, out_c, temb)
            if has_attn:
                transformer2d(d, f"down_blocks.{i}.attentions.{j}", out_c, cross_dim, linear_proj)
        if i < n - 1:
            conv(d, f"down_blocks.{i}.downsamplers.0.conv", out_c, out_c, 3)

    mid = block_out[-1]
    resnet(d, "mid_block.resnets.0", mid, mid, temb)
    resnet(d, "mid_block.resnets.1", mid, mid, temb)
    transformer2d(d, "mid_block.attentions.0", mid, cross_dim, linear_proj)

    # up: UpBlock2D + 3x CrossAttnUpBlock2D (diffusers resnet_in rules)
    rev = list(reversed(block_out))
    prev_out = rev[0]
    for i in range(n):
        out_c = rev[i]
        skip_in = rev[min(i + 1, n - 1)]
        has_attn = i > 0
        for j in range(layers + 1):
            res_skip = skip_in if j == layers else out_c
            res_in = prev_out if j == 0 else out_c
            resnet(d, f"up_blocks.{i}.resnets.{j}", res_in + res_skip, out_c, temb)
            if has_attn:
                transformer2d(d, f"up_blocks.{i}.attentions.{j}", out_c, cross_dim, linear_proj)
        if i < n - 1:
            conv(d, f"up_blocks.{i}.upsamplers.0.conv", out_c, out_c, 3)
        prev_out = out_c

    norm(d, "conv_norm_out", c0)
    conv(d, "conv_out", 4, c0, 3)
    return d


def vae_attention(d, prefix, ch):
    norm(d, f"{prefix}.group_norm", ch)
    for p in ("to_q", "to_k", "to_v", "to_out.0"):
        linear(d, f"{prefix}.{p}", ch, ch)


def vae_manifest(block_out=(128, 256, 512, 512), latent=4):
    d = {}
    layers = 2
    n = len(block_out)
    # encoder
    conv(d, "encoder.conv_in", block_out[0], 3, 3)
    for i, out_c in enumerate(block_out):
        in_c = block_out[i - 1] if i > 0 else block_out[0]
        for j in range(layers):
            resnet(d, f"encoder.down_blocks.{i}.resnets.{j}", in_c if j == 0 else out_c, out_c)
        if i < n - 1:
            conv(d, f"encoder.down_blocks.{i}.downsamplers.0.conv", out_c, out_c, 3)
    mid = block_out[-1]
    resnet(d, "encoder.mid_block.resnets.0", mid, mid)
    resnet(d, "encoder.mid_block.resnets.1", mid, mid)
    vae_attention(d, "encoder.mid_block.attentions.0", mid)
    norm(d, "encoder.conv_norm_out", mid)
    conv(d, "encoder.conv_out", 2 * latent, mid, 3)
    conv(d, "quant_conv", 2 * latent, 2 * latent, 1)
    conv(d, "post_quant_conv", latent, latent, 1)
    # decoder
    conv(d, "decoder.conv_in", mid, latent, 3)
    resnet(d, "decoder.mid_block.resnets.0", mid, mid)
    resnet(d, "decoder.mid_block.resnets.1", mid, mid)
    vae_attention(d, "decoder.mid_block.attentions.0", mid)
    rev = list(reversed(block_out))
    prev_out = rev[0]
    for i in range(n):
        out_c = rev[i]
        for j in range(layers + 1):
            resnet(d, f"decoder.up_blocks.{i}.resnets.{j}", prev_out if j == 0 else out_c, out_c)
        if i < n - 1:
            conv(d, f"decoder.up_blocks.{i}.upsamplers.0.conv", out_c, out_c, 3)
        prev_out = out_c
    norm(d, "decoder.conv_norm_out", block_out[0])
    conv(d, "decoder.conv_out", 3, block_out[0], 3)
    return d


def clip_manifest(hidden, inter, n_layers, vocab=49408, max_pos=77):
    d = {}
    d["text_model.embeddings.token_embedding.weight"] = (vocab, hidden)
    d["text_model.embeddings.position_embedding.weight"] = (max_pos, hidden)
    for i in range(n_layers):
        b = f"text_model.encoder.layers.{i}"
        for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
            linear(d, f"{b}.self_attn.{p}", hidden, hidden)
        norm(d, f"{b}.layer_norm1", hidden)
        norm(d, f"{b}.layer_norm2", hidden)
        linear(d, f"{b}.mlp.fc1", inter, hidden)
        linear(d, f"{b}.mlp.fc2", hidden, inter)
    norm(d, "text_model.final_layer_norm", hidden)
    return d


if __name__ == "__main__":
    emit("unet_sd15", unet_manifest((320, 640, 1280, 1280), 768, False))
    emit("unet_sd21base", unet_manifest((320, 640, 1280, 1280), 1024, True))
    emit("vae_sd", vae_manifest())
    emit("clip_sd15", clip_manifest(768, 3072, 12))
    emit("clip_sd21base", clip_manifest(1024, 4096, 23))
