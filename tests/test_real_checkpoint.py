"""Real-checkpoint integration (VERDICT round 1 item 7).

Synthesizes a complete small HF checkpoint ON DISK — config.json +
model.safetensors + the BGE-m3 sidecar heads (sparse_linear.pt /
colbert_linear.pt) + real tokenizer files — plus a cross-encoder
checkpoint, then drives the production loading paths end-to-end:
``get_embedder`` -> ``load_pretrained`` -> ``HFTokenizer`` ->
``build_app`` -> ingest -> fused ask with citations. Until round 2 these
sidecar/tokenizer paths had zero coverage (they were only exercised via
in-memory state dicts).

Also pins output parity of the loaded encoder vs the torch model it was
saved from (the loadable-artifact form of SURVEY.md section 7 step 3's
"cosine > 0.999 vs reference outputs").
"""

import asyncio
import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

VOCAB_WORDS = (
    "wolves hunt in packs across the tundra rivers carve canyons over "
    "millennia geiger counters measure gamma radiation how do what is "
    "about tell me"
).split()


def _make_tokenizer_files(path):
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from tokenizers.processors import TemplateProcessing
    from transformers import PreTrainedTokenizerFast

    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3, "<mask>": 4}
    for w in VOCAB_WORDS:
        vocab.setdefault(w, len(vocab))
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    tok.post_processor = TemplateProcessing(
        single="<s> $A </s>",
        pair="<s> $A </s> </s> $B </s>",
        special_tokens=[("<s>", 0), ("</s>", 2)],
    )
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        pad_token="<pad>",
        unk_token="<unk>",
        cls_token="<s>",
        sep_token="</s>",
        bos_token="<s>",
        eos_token="</s>",
        mask_token="<mask>",
    )
    fast.save_pretrained(str(path))
    return len(vocab)


def _xlmr_config(vocab_size):
    from transformers import XLMRobertaConfig

    return XLMRobertaConfig(
        vocab_size=vocab_size,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=128,
        pad_token_id=1,
        type_vocab_size=1,
    )


@pytest.fixture(scope="module")
def checkpoints(tmp_path_factory):
    """(encoder_dir, reranker_dir, torch encoder model)."""
    from transformers import (
        XLMRobertaForSequenceClassification,
        XLMRobertaModel,
    )

    enc_dir = tmp_path_factory.mktemp("bge-m3-tiny")
    rr_dir = tmp_path_factory.mktemp("bge-reranker-tiny")
    vocab_size = _make_tokenizer_files(enc_dir)
    _make_tokenizer_files(rr_dir)

    torch.manual_seed(0)
    enc = XLMRobertaModel(_xlmr_config(vocab_size), add_pooling_layer=False)
    enc = enc.eval()
    enc.save_pretrained(str(enc_dir), safe_serialization=True)
    # BGE-m3 sidecar heads, exactly as the real checkpoint ships them
    torch.save(
        {"weight": torch.randn(1, 64) * 0.1, "bias": torch.zeros(1)},
        enc_dir / "sparse_linear.pt",
    )
    torch.save(
        {"weight": torch.randn(32, 64) * 0.1, "bias": torch.zeros(32)},
        enc_dir / "colbert_linear.pt",
    )

    rr_cfg = _xlmr_config(vocab_size)
    rr_cfg.num_labels = 1
    rr = XLMRobertaForSequenceClassification(rr_cfg).eval()
    rr.save_pretrained(str(rr_dir), safe_serialization=True)
    return enc_dir, rr_dir, enc


def test_get_embedder_loads_checkpoint_with_parity(checkpoints):
    """get_embedder must load safetensors + sidecars + tokenizer from
    disk, and its embeddings must match the torch model (cosine > 0.999)."""
    from outline_rag_tpu.config import load_settings
    from outline_rag_tpu.engine.embedder import EncoderEmbedder, get_embedder

    enc_dir, _rr, torch_model = checkpoints
    settings = load_settings({"ENCODER_WEIGHTS_PATH": str(enc_dir)})
    emb = get_embedder(settings)
    assert isinstance(emb, EncoderEmbedder)
    assert "sparse" in emb.params and "colbert" in emb.params

    texts = ["wolves hunt in packs", "rivers carve canyons over millennia"]
    ours = emb.embed(texts)  # unit-norm CLS embeddings

    from transformers import AutoTokenizer

    hf_tok = AutoTokenizer.from_pretrained(str(enc_dir))
    batch = hf_tok(texts, padding=True, return_tensors="pt")
    with torch.no_grad():
        hidden = torch_model(**batch).last_hidden_state[:, 0, :].numpy()
    ref = hidden / np.linalg.norm(hidden, axis=1, keepdims=True)
    cos = (ours * ref).sum(axis=1)
    assert cos.min() > 0.999, cos


def test_get_embedder_fails_fast_on_bad_path(tmp_path):
    from outline_rag_tpu.config import load_settings
    from outline_rag_tpu.engine.embedder import get_embedder

    settings = load_settings({"ENCODER_WEIGHTS_PATH": str(tmp_path / "nope")})
    with pytest.raises(RuntimeError, match="ENCODER_WEIGHTS_PATH"):
        get_embedder(settings)


def test_build_app_serves_fused_ask_from_disk_checkpoints(checkpoints):
    """Full app over disk checkpoints: encoder + reranker load, the token
    cache is wired, ingest fills it, and an ask serves citations through
    the FUSED one-program path."""
    from outline_rag_tpu.config import load_settings
    from outline_rag_tpu.serve.app import build_app
    from outline_rag_tpu.serve.http import TestClient
    from outline_rag_tpu.serve.llm import FakeChatProvider
    from outline_rag_tpu.storage import SqliteMetaStore
    from outline_rag_tpu.sync.refresh import TASK_QUEUE
    from tests.fake_outline import FakeOutline

    enc_dir, rr_dir, _ = checkpoints
    settings = load_settings(
        {
            "SECRET_KEY": "s",
            "DATA_DIR": "",
            "OUTLINE_WEBHOOK_SECRET": "whsec",
            "ENCODER_WEIGHTS_PATH": str(enc_dir),
            "RERANKER_WEIGHTS_PATH": str(rr_dir),
            "SHARD_CAPACITY": "8192",
            "TOKEN_WIDTH": "32",
            "TOP_K": "4",
            "RERANK_K": "2",
            "LEX_WEIGHT": "0.2",  # sparse head active in the program
        }
    )
    fake = FakeOutline()
    fake.put_doc("d1", "Wolves", "wolves hunt in packs across the tundra", "t1")
    fake.put_doc("d2", "Rivers", "rivers carve canyons over millennia", "t1")
    app = build_app(
        settings,
        provider=FakeChatProvider(),
        meta=SqliteMetaStore(":memory:"),
        outline_transport=fake.transport(),
        start_workers=False,
    )
    retrieval = app.state["retrieval"]
    assert retrieval.fused, "disk checkpoints must enable the fused path"
    assert app.state["index"].tokens is not None
    client = TestClient(app)

    async def run():
        await client.post(
            "/chat/login",
            body=b"name=t",
            headers={"content-type": "application/x-www-form-urlencoded"},
        )
        await client.post("/chat/update/all")
        ing, bus = app.state["ingestor"], app.state["bus"]
        assert ing.tokenizer is not None  # token cache actually fed
        for _ in range(20):
            item = await bus.pop(TASK_QUEUE, timeout=0.01)
            if item is None:
                break
            if item["task"] == "refresh_all":
                await ing.refresh_all()
            else:
                await ing.process_doc_batch(item["ids"])
        assert app.state["index"].size > 0
        conv = json.loads(
            (
                await client.post(
                    "/chat/api/conversations", json_body={"title": "t"}
                )
            ).body
        )
        events = await client.sse(
            "POST",
            "/chat/api/ask",
            json_body={
                "question": "how do wolves hunt",
                "conversation_id": conv["id"],
            },
        )
        assert "[DONE]" in events
        text = "".join(
            e["choices"][0]["delta"].get("content", "")
            for e in events
            if isinstance(e, dict) and e.get("choices")
        )
        assert "[SourcesMap]:" in text

    asyncio.run(run())


def test_bf16_and_sharded_checkpoints_load(tmp_path):
    """bf16 is the standard shipping dtype for HF checkpoints (torch
    refuses .numpy() on it), and encoders commonly ship in the sharded
    index.json layout — both must load through the shared discovery."""
    import json

    from safetensors.torch import save_file
    from transformers import XLMRobertaModel

    vocab = _make_tokenizer_files(tmp_path)
    torch.manual_seed(3)
    model = XLMRobertaModel(_xlmr_config(vocab))
    sd = {k: v.to(torch.bfloat16) for k, v in model.state_dict().items()}
    sd = {k: v.contiguous() for k, v in sd.items()}
    # split into two shards with an index, like HF does above ~2B params
    keys = sorted(sd)
    half = len(keys) // 2
    shards = {
        "model-00001-of-00002.safetensors": {k: sd[k] for k in keys[:half]},
        "model-00002-of-00002.safetensors": {k: sd[k] for k in keys[half:]},
    }
    weight_map = {}
    for fname, part in shards.items():
        save_file(part, str(tmp_path / fname))
        weight_map.update({k: fname for k in part})
    (tmp_path / "model.safetensors.index.json").write_text(
        json.dumps({"weight_map": weight_map})
    )
    model.config.save_pretrained(str(tmp_path))

    from outline_rag_tpu.models.convert import load_pretrained

    cfg, params = load_pretrained(str(tmp_path))
    assert params["embed"]["word"].dtype == np.float32
    assert cfg.hidden == 64 and len(params["layers"]) == 2
