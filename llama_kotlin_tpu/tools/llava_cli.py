"""llava CLI: describe an image with a llava-class model.

Parity target: reference examples/llava/llava-cli.cpp — load the text
model GGUF + the mmproj GGUF, evaluate prompt-before-<image>, the image's
projected embeddings, prompt-after, then generate.

Usage:
    python -m llama_kotlin_tpu.tools.llava_cli -m model.gguf \
        --mmproj mmproj.gguf --image photo.jpg \
        -p "USER: <image>\\ndescribe the image ASSISTANT:" -n 64
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def load_image(path: str) -> np.ndarray:
    """Load an image file to uint8 HWC RGB (PIL when available; .npy as
    a fallback for environments without image codecs)."""
    if path.endswith(".npy"):
        arr = np.load(path)
        return np.asarray(arr, np.uint8)
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.uint8)


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser("llava", description=__doc__)
    ap.add_argument("--model", "-m", required=True)
    ap.add_argument("--mmproj", required=True, help="CLIP+projector GGUF")
    ap.add_argument("--image", required=True)
    ap.add_argument("--prompt", "-p",
                    default="USER: <image>\ndescribe the image ASSISTANT:")
    ap.add_argument("--n-predict", "-n", type=int, default=64)
    ap.add_argument("--n-ctx", "-c", type=int, default=4096)
    return ap


def main(argv=None):
    args = build_argparser().parse_args(argv)

    from llama_kotlin_tpu.models.loader import load_gguf_model
    from llama_kotlin_tpu.runtime.context import LlamaContext
    from llama_kotlin_tpu.tokenizer import build_tokenizer
    from llama_kotlin_tpu.vision.clip import ClipModel
    from llama_kotlin_tpu.vision.llava import llava_generate

    print(f"loading {args.model} + {args.mmproj} ...", file=sys.stderr)
    cfg, params, f = load_gguf_model(args.model)
    tokenizer = build_tokenizer(f.metadata)
    f.close()
    ctx = LlamaContext(cfg, params, n_cells=args.n_ctx)
    clip = ClipModel(args.mmproj)
    image = load_image(args.image)

    text = llava_generate(ctx, tokenizer, clip, args.prompt, image,
                          n_predict=args.n_predict)
    print(text)


if __name__ == "__main__":
    main()
