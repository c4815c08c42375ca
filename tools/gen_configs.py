"""Generate the 13 language YAML configs.

Data values (model hyperparameters, HF weight paths + pinned revisions) must match
the reference configs at /root/reference/pocket_tts/config/*.yaml so that the same
published checkpoints load; the YAML structure here is emitted from this template.
"""

from pathlib import Path

OUT = Path(__file__).parent.parent / "pocket_tts_tpu" / "configs"

VC_REV = "39592ff23c9ef80098bb74895d104c26275fe2c9"
NOVC_REV = "d29db7978e464fb90cb3359ee0c69a273b9142cc"

# language -> overrides
LANGS: dict[str, dict] = {
    "english": {},
    "english_2026-01": {
        "pad_with_spaces_for_short_inputs": True,
        "insert_bos_before_voice": False,
        "inner_dim": 512,
        "tokenizer_path": (
            f"hf://kyutai/pocket-tts-without-voice-cloning/tokenizer.model@{NOVC_REV}"
        ),
    },
    "english_2026-04": {"vc_rev": "19f95fe2df36e79fbd9f10008595cc4c977a0fcc"},
    "french_24l": {
        "num_layers": 24,
        "remove_semicolons": True,
        "model_recommended_frames_after_eos": 8,
    },
    "german": {"remove_semicolons": True},
    "german_24l": {"num_layers": 24, "remove_semicolons": True},
    "italian": {},
    "italian_24l": {"num_layers": 24},
    "portuguese": {},
    "portuguese_24l": {"num_layers": 24},
    "spanish": {},
    "spanish_24l": {"num_layers": 24},
}

TEMPLATE = """\
# pocket-tts-tpu language config: {lang}
# Same schema and checkpoint pins as the pocket-tts reference config of the same name.

weights_path: hf://kyutai/pocket-tts/languages/{lang}/model.safetensors@{vc_rev}
weights_path_without_voice_cloning: hf://kyutai/pocket-tts-without-voice-cloning/languages/{lang}/model.safetensors@{novc_rev}
{extra_top}
flow_lm:
  insert_bos_before_voice: {insert_bos}
  dtype: float32
  flow:
    depth: 6
    dim: 512
  transformer:
    d_model: 1024
    hidden_scale: 4
    max_period: 10000
    num_heads: 16
    num_layers: {num_layers}
  lookup_table:
    dim: 1024
    n_bins: 4000
    tokenizer: sentencepiece
    tokenizer_path: {tokenizer_path}

mimi:
  dtype: float32
  sample_rate: 24000
  inner_dim: {inner_dim}
  outer_dim: 512
  channels: 1
  frame_rate: 12.5
  seanet:
    dimension: 512
    channels: 1
    n_filters: 64
    n_residual_layers: 1
    ratios:
    - 6
    - 5
    - 4
    kernel_size: 7
    residual_kernel_size: 3
    last_kernel_size: 3
    dilation_base: 2
    pad_mode: constant
    compress: 2
  transformer:
    d_model: 512
    num_heads: 8
    num_layers: 2
    layer_scale: 0.01
    context: 250
    dim_feedforward: 2048
    input_dimension: 512
    output_dimensions:
    - 512
  quantizer:
    dimension: 32
    output_dimension: 512
"""


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    for lang, ov in LANGS.items():
        extra_top = ""
        if ov.get("pad_with_spaces_for_short_inputs"):
            extra_top += "pad_with_spaces_for_short_inputs: true\n"
        if ov.get("remove_semicolons"):
            extra_top += "remove_semicolons: true\n"
        if "model_recommended_frames_after_eos" in ov:
            extra_top += (
                f"model_recommended_frames_after_eos: {ov['model_recommended_frames_after_eos']}\n"
            )
        tok = ov.get(
            "tokenizer_path",
            f"hf://kyutai/pocket-tts-without-voice-cloning/languages/{lang}/"
            f"tokenizer.model@{NOVC_REV}",
        )
        text = TEMPLATE.format(
            lang=lang,
            vc_rev=ov.get("vc_rev", VC_REV),
            novc_rev=NOVC_REV,
            extra_top=extra_top,
            insert_bos=str(ov.get("insert_bos_before_voice", True)).lower(),
            num_layers=ov.get("num_layers", 6),
            tokenizer_path=tok,
            inner_dim=ov.get("inner_dim", 32),
        )
        (OUT / f"{lang}.yaml").write_text(text)
        print("wrote", lang)


if __name__ == "__main__":
    main()
