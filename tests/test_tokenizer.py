"""CLIP BPE tokenizer parity vs the HF implementation (the reference's
tokenizer: ldm/modules/encoders/modules.py:152 uses
transformers.CLIPTokenizer).

No pretrained vocab exists in this environment, so a full-size SYNTHETIC
vocab.json/merges.txt (49408 entries — the ids our implementation
hardcodes for SOT/EOT only hold at the real vocab size) is generated and
loaded by BOTH tokenizers; any divergence in cleaning, the BPE merge loop,
end-of-word handling, truncation, or EOT padding shows up as an id
mismatch.
"""

import json
import os

import numpy as np
import pytest

from instancediffusion_tpu.data.tokenizer import (
    EOT, MAX_LEN, SOT, VOCAB_SIZE, CLIPTokenizer, _bytes_to_unicode,
)

MERGES = [
    ("h", "e"),
    ("l", "l"),
    ("he", "ll"),
    ("o", "n</w>"),
    ("hell", "o</w>"),
    ("w", "o"),
    ("r", "ld</w>"),
    ("l", "d</w>"),
    ("wo", "rld</w>"),  # dead: ("r","ld</w>") outranks, leaving "r ld</w>"
    ("1", "2</w>"),
]


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("clip_vocab")
    chars = list(_bytes_to_unicode().values())
    tokens = chars + [c + "</w>" for c in chars]
    tokens += [a + b for a, b in MERGES]
    tokens += [f"fill{i}" for i in range(SOT - len(tokens))]
    tokens += ["<|startoftext|>", "<|endoftext|>"]
    assert len(tokens) == VOCAB_SIZE
    vocab = {t: i for i, t in enumerate(tokens)}
    assert vocab["<|startoftext|>"] == SOT and vocab["<|endoftext|>"] == EOT
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in MERGES) + "\n"
    )
    return str(d)


TEXTS = [
    "hello world",
    "Hello,   WORLD!!",          # case folding + whitespace collapse + punct
    "hellhello onon",            # merge-order and partial-merge interplay
    "a robin on a hill",         # mostly-unmerged chars
    "12 121 212",                # digit tokens split per-char by the regex
    "hello " * 60,               # > 75 content tokens -> truncation
    "",                          # empty -> [SOT, EOT, EOT...]
]


def test_bpe_matches_hf_on_synthetic_vocab(vocab_dir):
    hf_mod = pytest.importorskip("transformers")
    hf = hf_mod.CLIPTokenizer(
        os.path.join(vocab_dir, "vocab.json"),
        os.path.join(vocab_dir, "merges.txt"),
    )
    ours = CLIPTokenizer.from_files(
        os.path.join(vocab_dir, "vocab.json"),
        os.path.join(vocab_dir, "merges.txt"),
    )
    assert not ours.is_fallback
    for text in TEXTS:
        want = hf(
            text, padding="max_length", truncation=True, max_length=MAX_LEN
        ).input_ids
        got = ours.encode(text)
        assert got.shape == (MAX_LEN,) and got.dtype == np.int32
        np.testing.assert_array_equal(got, np.asarray(want), err_msg=text)


def test_fallback_is_deterministic_and_marked():
    fb = CLIPTokenizer(None, None)
    assert fb.is_fallback
    a, b = fb.encode("a cat on a mat"), fb.encode("a cat on a mat")
    np.testing.assert_array_equal(a, b)
    assert a[0] == SOT and a[-1] == EOT
    # different words -> different ids (no degenerate constant hash)
    assert not np.array_equal(fb.encode("dog"), fb.encode("cat"))


def test_fallback_refused_unless_opted_in(monkeypatch):
    """Flagship paths must never silently generate with meaningless ids
    (VERDICT r3 #4)."""
    fb = CLIPTokenizer(None, None)
    monkeypatch.delenv("IDTPU_ALLOW_HASH_TOKENIZER", raising=False)
    with pytest.raises(RuntimeError, match="fetch_clip_bpe"):
        fb.require_real("test")
    monkeypatch.setenv("IDTPU_ALLOW_HASH_TOKENIZER", "1")
    assert fb.require_real("test") is fb
    # a real tokenizer passes regardless of the env knob
    monkeypatch.delenv("IDTPU_ALLOW_HASH_TOKENIZER", raising=False)
    real = CLIPTokenizer({"x": 0}, [])
    assert real.require_real("test") is real


# Canonical example ids from the OpenAI CLIP / HF docs: the real-vocab
# golden check. Runs only where tools/fetch_clip_bpe.py has populated the
# assets (this build environment has no egress, so it skips here — the
# fetch script itself re-verifies the same goldens at download time).
REAL_GOLDEN = {
    "a photo of a cat": [49406, 320, 1125, 539, 320, 2368, 49407],
    "a photo of a dog": [49406, 320, 1125, 539, 320, 1929, 49407],
}


def test_real_vocab_golden_ids():
    from instancediffusion_tpu.data.tokenizer import ASSETS_DIR

    if not os.path.exists(os.path.join(ASSETS_DIR, "vocab.json")):
        pytest.skip("real CLIP BPE assets not vendored (no-egress host)")
    tok = CLIPTokenizer.load_default()
    assert not tok.is_fallback
    for text, want in REAL_GOLDEN.items():
        got = tok.encode(text)
        assert got[: len(want)].tolist() == want, text
        assert (got[len(want):] == EOT).all()
