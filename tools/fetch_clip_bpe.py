#!/usr/bin/env python
"""Fetch the CLIP BPE tokenizer assets (vocab.json + merges.txt, ~1.8MB,
MIT-licensed) into instancediffusion_tpu/assets/clip_bpe/ and verify them
against golden token ids.

The reference gets these implicitly via HuggingFace
(/root/reference/ldm/modules/encoders/modules.py:152 —
CLIPTokenizer.from_pretrained("openai/clip-vit-large-patch14")). This
build environment has zero network egress, so the assets cannot be
vendored into git here; on any networked host this script is a one-shot:

    python tools/fetch_clip_bpe.py

After it succeeds, CLIPTokenizer.load_default() picks the files up
automatically and the hash fallback (plus its IDTPU_ALLOW_HASH_TOKENIZER
opt-in) is never used again.
"""

import json
import os
import sys
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from instancediffusion_tpu.data.tokenizer import ASSETS_DIR, CLIPTokenizer

BASE = "https://huggingface.co/openai/clip-vit-large-patch14/resolve/main"
FILES = ["vocab.json", "merges.txt"]

# Golden ids for the real CLIP vocab (the canonical example from the
# OpenAI CLIP / HF docs). If the downloaded files don't reproduce these,
# the fetch is corrupt and is deleted.
GOLDEN = {
    "a photo of a cat": [49406, 320, 1125, 539, 320, 2368, 49407],
    "a photo of a dog": [49406, 320, 1125, 539, 320, 1929, 49407],
}


def main() -> int:
    os.makedirs(ASSETS_DIR, exist_ok=True)
    for name in FILES:
        dst = os.path.join(ASSETS_DIR, name)
        if os.path.exists(dst):
            print(f"already present: {dst}")
            continue
        url = f"{BASE}/{name}"
        print(f"fetching {url} ...")
        urllib.request.urlretrieve(url, dst)  # noqa: S310 — fixed HF URL
        print(f"  -> {dst} ({os.path.getsize(dst)} bytes)")

    tok = CLIPTokenizer.load_default()
    if tok.is_fallback:
        print("ERROR: load_default still resolves to the fallback", file=sys.stderr)
        return 1
    for text, want in GOLDEN.items():
        got = tok.encode(text)[: len(want)].tolist()
        if got != want:
            print(f"ERROR: golden mismatch for {text!r}: {got} != {want}",
                  file=sys.stderr)
            for name in FILES:
                os.remove(os.path.join(ASSETS_DIR, name))
            return 1
    # record provenance next to the assets
    with open(os.path.join(ASSETS_DIR, "PROVENANCE.json"), "w") as f:
        json.dump({"source": BASE, "files": FILES, "license": "MIT"}, f, indent=1)
    print("ok: golden token ids verified; real BPE tokenizer active")
    return 0


if __name__ == "__main__":
    sys.exit(main())
