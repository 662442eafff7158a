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
