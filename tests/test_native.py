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


def test_http_head_parser_parity_fuzz():
    """The native request-head parser must agree with the Python fallback
    on every well-formed head and reject what Python rejects."""
    import numpy as np

    from outline_rag_tpu.native import parse_request_head_native

    if parse_request_head_native(b"GET / HTTP/1.1\r\n\r\n") is None:
        import pytest

        pytest.skip("native library unavailable")

    def python_parse(head: bytes):
        lines = head.decode("latin1").split("\r\n")
        try:
            method, target, _version = lines[0].split(" ", 2)
        except ValueError:
            return None
        headers = {}
        for line in lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        return method, target, headers

    rng = np.random.default_rng(0)
    methods = ["GET", "POST", "PUT", "DELETE", "OPTIONS", "PATCH"]
    name_chars = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ-_0123456789"
    for trial in range(300):
        method = methods[rng.integers(len(methods))]
        target = "/" + "".join(
            rng.choice(list("abc/def?=&%123")) for _ in range(rng.integers(1, 30))
        )
        n_headers = int(rng.integers(0, 12))
        lines = [f"{method} {target} HTTP/1.1"]
        for _ in range(n_headers):
            name = "".join(
                rng.choice(list(name_chars)) for _ in range(rng.integers(1, 16))
            )
            value = "".join(
                rng.choice(list(name_chars + " :;,=."))
                for _ in range(rng.integers(0, 40))
            )
            pad_l = " " * int(rng.integers(0, 3))
            pad_r = " " * int(rng.integers(0, 3))
            lines.append(f"{name}:{pad_l}{value}{pad_r}")
        head = ("\r\n".join(lines) + "\r\n\r\n").encode("latin1")
        want = python_parse(head)
        got = parse_request_head_native(head)
        assert got == want, (head, got, want)

    # malformed request lines: native returns None (Python path decides)
    for bad in (b"NOSPACES\r\n\r\n", b"GET /only-two\r\n\r\n", b" \r\n\r\n"):
        assert parse_request_head_native(bad) is None
