"""End-to-end serving benchmark over real TCP.

Boots the full app (fixture wiki, fake LLM, hash embedder — the offline
configuration) on an ephemeral port, then measures the ask path the way
a user hits it: login -> conversation -> N sequential warm asks (p50/p95
wall time to the final SSE frame) and M concurrent asks (aggregate
throughput through the query micro-batcher).

Usage: python tools/bench_serve.py [n_sequential] [m_concurrent]
"""

from __future__ import annotations

import asyncio
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))


async def main(n_seq: int, m_conc: int) -> None:
    import numpy as np

    from fake_outline import FakeOutline
    from outline_rag_tpu.config import load_settings
    from outline_rag_tpu.models.hash_embedder import HashEmbedder
    from outline_rag_tpu.serve.app import build_app
    from outline_rag_tpu.serve.http import TestClient
    from outline_rag_tpu.serve.llm import FakeChatProvider

    settings = load_settings(
        {
            "SECRET_KEY": "bench",
            "VECTOR_DIM": "256",
            "DATA_DIR": "",
            "CHUNK_SIZE": "256",
            "CHUNK_OVERLAP": "32",
        }
    )
    fake = FakeOutline()
    rng = np.random.default_rng(0)
    words = "wolf river star canyon helium pack tundra orbit moon forest".split()
    for d in range(40):
        body = " ".join(rng.choice(words, size=200))
        fake.put_doc(f"d{d}", f"Doc {d}", body, "t1")
    app = build_app(
        settings,
        provider=FakeChatProvider(),
        embedder=HashEmbedder(dim=256),
        outline_transport=fake.transport(),
        start_workers=False,
    )
    client = TestClient(app)
    await client.post(
        "/chat/login",
        body=b"name=bench",
        headers={"content-type": "application/x-www-form-urlencoded"},
    )
    # ingest the fixture corpus (drain the task queue inline)
    from outline_rag_tpu.sync.refresh import TASK_QUEUE

    ing = app.state["ingestor"]
    bus = app.state["bus"]
    await ing.refresh_all()
    while True:
        item = await bus.pop(TASK_QUEUE, timeout=0.01)
        if item is None:
            break
        if item["task"] == "refresh_all":
            await ing.refresh_all()
        elif item["task"] == "process_doc_batch":
            await ing.process_doc_batch(item["ids"])
    conv = json.loads(
        (
            await client.post("/chat/api/conversations", json_body={"title": "b"})
        ).body
    )

    async def ask(q: str) -> float:
        t0 = time.perf_counter()
        events = await client.sse(
            "POST",
            "/chat/api/ask",
            json_body={"conversation_id": conv["id"], "question": q},
        )
        assert events, "no SSE frames"
        return time.perf_counter() - t0

    await ask("warmup wolf river")  # compile/warm

    lat = []
    for i in range(n_seq):
        lat.append(await ask(f"tell me about {words[i % len(words)]} {i}"))
    lat.sort()
    p50 = lat[len(lat) // 2] * 1e3
    p95 = lat[int(len(lat) * 0.95) - 1] * 1e3 if len(lat) >= 2 else p50

    t0 = time.perf_counter()
    await asyncio.gather(
        *[ask(f"concurrent {words[i % len(words)]} {i}") for i in range(m_conc)]
    )
    conc_dt = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "metric": f"warm ask end-to-end (seq n={n_seq}, conc m={m_conc}, "
                f"{app.state['index'].size} chunks)",
                "p50_ms": round(p50, 1),
                "p95_ms": round(p95, 1),
                "concurrent_asks_per_s": round(m_conc / conc_dt, 1),
            }
        )
    )


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    asyncio.run(main(n, m))
