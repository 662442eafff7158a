"""Staged-vs-fused rerank agreement (VERDICT round 1 weak item 6).

The two execution paths encode cross-encoder pairs differently by
construction: staged tokenizes (query, full chunk text) pairs
(``models/tokenizer.py::batch_pairs``) while fused concatenates the
cached fixed-width chunk tokens after the query (``engine/fused.py``,
slot 0 rewritten to the EOS separator). These tests PIN the measured
relationship on a fixed seed:

- when chunk texts fit the token cache width, the rankings agree
  exactly (every candidate, every position);
- when texts exceed the cache width (fused reranks a truncated view),
  the candidate SET still matches exactly (dense retrieval is shared)
  and the pairwise order agreement stays above the measured floor
  (0.825 on this seed; pinned at 0.75).
"""

import itertools

import numpy as np
import pytest

import jax

from outline_rag_tpu.engine.embedder import EncoderEmbedder
from outline_rag_tpu.engine.rerank import CrossEncoderReranker
from outline_rag_tpu.engine.service import RetrievalService
from outline_rag_tpu.index import VectorIndex
from outline_rag_tpu.models.encoder import EncoderConfig, init_encoder_params
from outline_rag_tpu.models.reranker import init_reranker_params
from outline_rag_tpu.models.tokenizer import HashTokenizer


@pytest.fixture(scope="module")
def models():
    cfg = EncoderConfig.tiny()
    enc_params = init_encoder_params(jax.random.key(0), cfg)
    rr_params = init_reranker_params(jax.random.key(1), cfg)
    tok = HashTokenizer(vocab_size=cfg.vocab_size)
    emb = EncoderEmbedder(
        enc_params, cfg, tok, max_tokens=64, seq_buckets=(32, 64), name="tiny"
    )
    rr = CrossEncoderReranker(rr_params, cfg, tok, max_tokens=128)
    return emb, rr


def _services(emb, rr, docs):
    texts = {}
    idx_f = VectorIndex(dim=emb.dim, capacity=2048, token_width=32)
    idx_s = VectorIndex(dim=emb.dim, capacity=2048)
    for name, text in docs.items():
        cid = f"{name}:0"
        texts[cid] = text
        tb = emb.tokenizer.batch([text], 32, buckets=(32,))
        idx_f.add_chunks(
            [cid], emb.embed([text]), source_id=name,
            token_ids=tb.input_ids, token_mask=tb.attention_mask,
        )
        idx_s.add_chunks([cid], emb.embed([text]), source_id=name)
    staged = RetrievalService(
        idx_s, emb, rr, top_k=6, rerank_k=6, chunk_text_lookup=texts.get
    )
    fused = RetrievalService(
        idx_f, emb, rr, top_k=6, rerank_k=6, chunk_text_lookup=texts.get
    )
    assert not staged.fused and fused.fused
    return staged, fused


def _agreement(staged_out, fused_out):
    set_agree, pair_agree, top1 = [], [], 0
    for s_row, f_row in zip(staged_out, fused_out):
        s_ids = [c.chunk_id for c in s_row]
        f_ids = [c.chunk_id for c in f_row]
        set_agree.append(len(set(s_ids) & set(f_ids)) / max(len(s_ids), 1))
        if s_ids and f_ids and s_ids[0] == f_ids[0]:
            top1 += 1
        common = [c for c in s_ids if c in f_ids]
        agree = total = 0
        for a, b in itertools.combinations(common, 2):
            total += 1
            agree += (s_ids.index(a) < s_ids.index(b)) == (
                f_ids.index(a) < f_ids.index(b)
            )
        if total:
            pair_agree.append(agree / total)
    return float(np.mean(set_agree)), float(np.mean(pair_agree)), top1


def test_exact_agreement_when_texts_fit_cache(models):
    emb, rr = models
    docs = {
        f"doc{i}": (
            f"topic {i % 5} subject {i} words about thing {i * 7 % 11} "
            f"and matter {i * 3 % 13}"
        )
        for i in range(16)
    }
    staged, fused = _services(emb, rr, docs)
    queries = [f"topic {i} subject matter {i}" for i in range(8)]
    set_a, pair_a, top1 = _agreement(
        staged.retrieve_batch(queries), fused.retrieve_batch(queries)
    )
    assert set_a == 1.0
    assert pair_a == 1.0, pair_a
    assert top1 == 8


def test_bounded_drift_when_texts_exceed_cache(models):
    emb, rr = models
    rng = np.random.default_rng(0)
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    docs = {
        f"doc{i}": " ".join(rng.choice(words, size=60)) + f" marker{i}"
        for i in range(16)
    }
    staged, fused = _services(emb, rr, docs)
    queries = [f"{words[i % 10]} marker{i}" for i in range(8)]
    set_a, pair_a, top1 = _agreement(
        staged.retrieve_batch(queries), fused.retrieve_batch(queries)
    )
    # dense candidate sets are shared between the paths: always identical
    assert set_a == 1.0
    # rerank order over the truncated view drifts: measured 0.825 / 6-of-8
    # top-1 on this seed; floors pinned just below
    assert pair_a >= 0.75, pair_a
    assert top1 >= 5, top1
