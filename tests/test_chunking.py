"""Chunking policy tests (reference behavior: app/rag.py:103-116,186-209)."""

from outline_rag_tpu.utils.chunking import chunk_document, split_text


def test_short_text_single_chunk():
    assert split_text("hello world", chunk_size=1024) == ["hello world"]


def test_empty_text_no_chunks():
    assert split_text("") == []
    assert split_text("   \n\n  ") == []


def test_chunks_respect_size_limit():
    text = "\n\n".join(f"paragraph {i} " + "x" * 200 for i in range(40))
    chunks = split_text(text, chunk_size=1024, chunk_overlap=100)
    assert len(chunks) > 1
    assert all(len(c) <= 1024 for c in chunks)


def test_overlap_carries_context():
    paras = [f"para{i:02d} " + "y" * 90 for i in range(30)]
    text = "\n\n".join(paras)
    chunks = split_text(text, chunk_size=300, chunk_overlap=100)
    assert len(chunks) > 2
    # consecutive chunks share some suffix/prefix content
    shared = 0
    for a, b in zip(chunks, chunks[1:]):
        tail = a[-60:]
        if tail and tail.strip() and tail.strip()[:20] in b:
            shared += 1
    assert shared > 0


def test_hard_split_without_separators():
    text = "z" * 5000  # no separators at all -> falls through to char split
    chunks = split_text(text, chunk_size=1024, chunk_overlap=100)
    assert all(len(c) <= 1024 for c in chunks)
    assert sum(len(c) for c in chunks) >= 5000  # full coverage (with overlap)


def test_title_injection():
    chunks = chunk_document("My Doc", "some body text", chunk_size=100, chunk_overlap=10)
    assert len(chunks) == 1
    assert chunks[0].text.startswith("Document title: My Doc\n\n")
    assert chunks[0].body == "some body text"


def test_chunk_offsets_monotonic():
    text = "\n\n".join(f"p{i} " + "w" * 120 for i in range(20))
    chunks = chunk_document("T", text, chunk_size=400, chunk_overlap=50)
    starts = [c.start for c in chunks]
    assert starts == sorted(starts)
    for c in chunks:
        assert text[c.start : c.start + 10] == c.body[:10]


def test_chunks_never_exceed_chunk_size():
    """The documented bound: overlap carry must not push an emitted
    chunk past chunk_size (was up to chunk_size + chunk_overlap)."""
    text = ("alpha " * 9).strip() + "\n\n" + "b" * 1000 + "\n\n" + "tail"
    for chunks in (
        split_text(text, chunk_size=1024, chunk_overlap=100),
        split_text(text * 3, chunk_size=1024, chunk_overlap=100),
    ):
        assert chunks and all(len(c) <= 1024 for c in chunks), [
            len(c) for c in chunks
        ]


def test_unicode_whitespace_parity_native_vs_python():
    """CJK ideographic space / NBSP strip identically in both
    implementations — divergent chunk text changes stable_chunk_id per
    build environment."""
    import os

    text = ("言葉　" * 300 + "\n\n" + " 段落 " * 300 + "\n\n"
            + "end 　\n\n") * 2
    py = None
    try:
        os.environ["ORT_NATIVE"] = "0"
        py = split_text(text, 256, 32)
    finally:
        os.environ.pop("ORT_NATIVE", None)
    native = split_text(text, 256, 32)
    assert py == native
    assert all(not c[0].isspace() and not c[-1].isspace() for c in py)


def test_lone_surrogate_falls_back_to_python():
    """A lone surrogate (unpaired \\ud800 surviving json.loads) cannot
    encode to UTF-32: the native path must return None and the Python
    path must still chunk the document."""
    import json

    bad = json.loads('"\\ud800"')
    text = ("paragraph one " * 40 + bad + "\n\n") * 12
    chunks = split_text(text, 256, 32)
    assert chunks and all(len(c) <= 256 for c in chunks)


def test_repeated_bodies_get_distinct_start_offsets():
    from outline_rag_tpu.utils.chunking import chunk_document

    body = "A" * 300
    text = (body + "\n\n") * 3
    chunks = chunk_document("", text, chunk_size=400, chunk_overlap=0)
    starts = [c.start for c in chunks]
    assert len(set(starts)) == len(starts), starts
    assert starts == sorted(starts)
