"""Noise database builder (reference tools/make_lmdb.py).

Builds either the native .pack store (default; no lmdb dependency) or an
LMDB directory when lmdb is installed and --format lmdb is given. Keys come
from the scp file; musan-style keys ('noise_*', 'speech_*', 'music_*')
drive the SNR ranges in add_noise (processor.py:657-662).

  python -m wesep_tpu.tools.make_noise_db noise.scp out.pack
"""

import argparse


def get_args():
    parser = argparse.ArgumentParser(description="make noise db")
    parser.add_argument("in_scp_file")
    parser.add_argument("out_path")
    parser.add_argument("--format", choices=("pack", "lmdb"),
                        default="pack")
    return parser.parse_args()


def main():
    args = get_args()
    from wesep_tpu.utils.file_utils import read_2columns_text

    entries = read_2columns_text(args.in_scp_file)
    keys = list(entries.keys())
    paths = [entries[k] for k in keys]
    if args.format == "pack":
        from wesep_tpu.data.noise_store import build_pack

        build_pack(paths, args.out_path, keys)
    else:
        import math
        import pickle

        import lmdb

        db = lmdb.open(args.out_path, map_size=int(math.pow(1024, 4)))
        with db.begin(write=True) as txn:
            for key, wav in zip(keys, paths):
                with open(wav, "rb") as f:
                    txn.put(key.encode(), f.read())
            txn.put(b"__keys__", pickle.dumps(keys))
        db.sync()
        db.close()
    print(f"wrote {len(keys)} noise entries to {args.out_path}")


if __name__ == "__main__":
    main()
