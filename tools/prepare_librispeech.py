"""Prepare a pre-decoded LibriSpeech mirror for e2e_asr_tpu.

The training corpus adapter (e2e_asr_tpu/data/corpus.py) reads `.wav` or
`.npy` files laid out like the original LibriSpeech tree next to the
`*.trans.txt` transcripts. This tool builds that mirror from an original
FLAC distribution using whatever decoder is available on the machine:

    python tools/prepare_librispeech.py --src /data/LibriSpeech \\
        --dst /data/librispeech_wav --splits train-clean-100 dev-clean

Decoder resolution order: `flac` CLI, `ffmpeg` CLI, python-soundfile.
(The build sandbox has none of these — run this on the machine where the
dataset lives; transcripts are copied verbatim.)
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys


def find_decoder():
    if shutil.which("flac"):
        return "flac"
    if shutil.which("ffmpeg"):
        return "ffmpeg"
    try:
        import soundfile  # noqa: F401

        return "soundfile"
    except ImportError:
        return None


def decode_one(dec: str, src: str, dst: str) -> None:
    if dec == "flac":
        subprocess.run(["flac", "-d", "-f", "-s", "-o", dst, src], check=True)
    elif dec == "ffmpeg":
        subprocess.run(
            ["ffmpeg", "-y", "-loglevel", "error", "-i", src, "-ar", "16000", dst],
            check=True,
        )
    elif dec == "soundfile":
        import numpy as np
        import soundfile as sf

        data, sr = sf.read(src, dtype="int16")
        sf.write(dst, data, sr, subtype="PCM_16")
    else:
        raise RuntimeError("no decoder")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="original LibriSpeech root (flac)")
    ap.add_argument("--dst", required=True, help="mirror output root")
    ap.add_argument("--splits", nargs="+", default=["train-clean-100", "dev-clean", "test-clean"])
    args = ap.parse_args()

    dec = find_decoder()
    if dec is None:
        sys.exit(
            "No FLAC decoder found (need `flac`, `ffmpeg`, or python-soundfile). "
            "Run this tool on a machine that has one, then copy the mirror."
        )
    print(f"using decoder: {dec}")

    n = 0
    for split in args.splits:
        root = os.path.join(args.src, split)
        if not os.path.isdir(root):
            sys.exit(f"missing split dir: {root}")
        for dirpath, _, files in os.walk(root):
            rel = os.path.relpath(dirpath, args.src)
            outdir = os.path.join(args.dst, rel)
            os.makedirs(outdir, exist_ok=True)
            for fn in files:
                if fn.endswith(".trans.txt"):
                    shutil.copy2(os.path.join(dirpath, fn), os.path.join(outdir, fn))
                elif fn.endswith(".flac"):
                    dst = os.path.join(outdir, fn[:-5] + ".wav")
                    if not os.path.exists(dst):
                        decode_one(dec, os.path.join(dirpath, fn), dst)
                    n += 1
                    if n % 500 == 0:
                        print(f"  {n} files...", flush=True)
    print(f"done: {n} utterances -> {args.dst}")


if __name__ == "__main__":
    main()
