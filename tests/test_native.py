"""Native chunker parity vs the Python reference implementation."""

import os

import numpy as np
import pytest

from outline_rag_tpu import native
from outline_rag_tpu.utils import chunking


def _python_split(text, size, overlap):
    """Force the pure-Python path."""
    old = os.environ.get("ORT_NATIVE")
    os.environ["ORT_NATIVE"] = "0"
    try:
        return chunking.split_text(text, size, overlap)
    finally:
        if old is None:
            os.environ.pop("ORT_NATIVE", None)
        else:
            os.environ["ORT_NATIVE"] = old


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


CASES = [
    # paragraphs
    "\n\n".join(f"paragraph {i} " + "word " * 60 for i in range(30)),
    # long lines, newline-separated
    "\n".join(f"line {i} " + "x" * 180 for i in range(60)),
    # no separators at all (char-level split)
    "z" * 7000,
    # spaces only
    "word " * 3000,
    # mixed unicode incl. CJK + emoji (code-point sizing)
    ("中文段落，测试多字节字符。" * 40 + "\n\n" + "日本語テキスト " * 60 + "\n\n" + "🌲" * 500) * 3,
    # leading/trailing whitespace
    "\n\n\n   " + "\n\n".join("para " + "y" * 120 for _ in range(40)) + "   \n\n",
]


@pytest.mark.parametrize("idx", range(len(CASES)))
def test_native_matches_python(lib, idx):
    text = CASES[idx]
    for size, overlap in [(1024, 100), (300, 50), (2048, 0)]:
        py = _python_split(text, size, overlap)
        nat = native.chunk_text_native(text, size, overlap)
        assert nat == py, (
            f"case {idx} size={size} overlap={overlap}: "
            f"{len(py)} py vs {len(nat)} native chunks"
        )


def test_native_used_by_default(lib):
    text = "\n\n".join("p " + "w" * 200 for _ in range(50))
    out = chunking.split_text(text, 1024, 100)
    assert out == _python_split(text, 1024, 100)


def test_native_large_doc_parity(lib):
    text = "\n\n".join(f"p{i} " + "word " * 100 for i in range(400))
    assert native.chunk_text_native(text, 1024, 100) == _python_split(
        text, 1024, 100
    )
