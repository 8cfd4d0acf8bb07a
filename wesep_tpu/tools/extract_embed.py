"""Speaker-embedding extraction with an in-repo speaker encoder.

Replaces the reference's onnx-based wespeaker extractor
(tools/extract_embed_depreciated.py): loads a trained speaker-encoder
checkpoint (or the speaker branch of a joint TSE checkpoint), computes
kaldi fbank + CMVN on each wav, and writes embed.ark/embed.scp (kaldi
binary float vectors, readable by read_vec_scp_file and by kaldiio).

  python -m wesep_tpu.tools.extract_embed --wav_scp wav.scp \
      --checkpoint ckpt.ckpt --spk_model ResNet34 \
      --spk_args '{"embed_dim": 256, "pooling_func": "TSTP", "two_emb_layer": false}' \
      --out_base exp/embed
"""

import argparse
import json


def get_args():
    parser = argparse.ArgumentParser(description="extract embeddings")
    parser.add_argument("--wav_scp", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--spk_model", required=True)
    parser.add_argument("--spk_args", default="{}")
    parser.add_argument("--out_base", required=True)
    parser.add_argument("--num_mel_bins", type=int, default=80)
    parser.add_argument("--model_index", type=int, default=0)
    parser.add_argument(
        "--subtree", default=None,
        help="param subtree holding the speaker model (e.g. spk_model_net "
             "for joint TSE checkpoints)",
    )
    return parser.parse_args()


def main():
    args = get_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wesep_tpu.data.wav_io import read_wav
    from wesep_tpu.models.speaker import get_speaker_model
    from wesep_tpu.ops.fbank import apply_cmvn, kaldi_fbank
    from wesep_tpu.train.checkpoint import load_checkpoint
    from wesep_tpu.utils import setup_compilation_cache
    from wesep_tpu.utils.file_utils import (
        read_2columns_text,
        write_vec_ark_scp,
    )

    setup_compilation_cache()
    spk_args = json.loads(args.spk_args)
    spk_args.pop("feat_dim", None)
    model = get_speaker_model(args.spk_model)(**spk_args)

    bundle = load_checkpoint(args.checkpoint)
    params = bundle["models"][args.model_index]
    stats_list = bundle.get("batch_stats") or [{}]
    batch_stats = stats_list[args.model_index] if stats_list else {}
    if args.subtree:
        params = params[args.subtree]
        if batch_stats:
            batch_stats = batch_stats.get(args.subtree, {})
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats

    @jax.jit
    def forward(feats):
        out = model.apply(variables, feats, train=False)
        if isinstance(out, (tuple, list)):
            out = out[-1]
        return out

    wavs = read_2columns_text(args.wav_scp)
    embeds = {}
    for utt, path in wavs.items():
        wav, sr = read_wav(path)
        feats = kaldi_fbank(
            jnp.asarray(wav[0]), sample_rate=sr,
            num_mel_bins=args.num_mel_bins, input_scale=32768.0,
        )
        feats = apply_cmvn(feats)[None]
        embeds[utt] = np.asarray(forward(feats))[0]
    ark, scp = write_vec_ark_scp(args.out_base, embeds)
    print(f"wrote {len(embeds)} embeddings to {ark} / {scp}")


if __name__ == "__main__":
    main()
