"""Run the app fully offline with fixture data (dev/demo/browser-testing).

Starts the server on PORT (default 8011) with: hash embedder, fake chat
provider, in-memory sqlite, and a fake Outline wiki pre-loaded with a few
documents already ingested. Dev login is enabled (no OIDC configured).
"""

from __future__ import annotations

import asyncio
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

# the dev/demo server is fully offline (hash embedder, fake LLM): force
# the CPU backend so it never depends on the TPU tunnel's health
import jax

jax.config.update("jax_platforms", "cpu")

from outline_rag_tpu.config import load_settings
from outline_rag_tpu.serve.app import build_app
from outline_rag_tpu.serve.http import serve
from outline_rag_tpu.serve.llm import FakeChatProvider
from outline_rag_tpu.models.hash_embedder import HashEmbedder
from outline_rag_tpu.storage import SqliteMetaStore
from fake_outline import FakeOutline

DOCS = [
    ("d1", "Wolf Pack Dynamics", "Wolves hunt in coordinated packs across the tundra.\n\nThe alpha pair leads seasonal migrations following caribou herds."),
    ("d2", "River Geology", "Rivers carve canyons over millennia through sedimentary rock.\n\nDelta formation occurs where flow velocity drops."),
    ("d3", "Stellar Fusion", "Stars fuse hydrogen into helium in their cores.\n\nHeavier elements form during supernova events."),
]


async def main() -> None:
    port = int(os.environ.get("PORT", 8011))
    settings = load_settings(
        {
            "SECRET_KEY": "dev-demo-secret",
            "VECTOR_DIM": "256",
            "DATA_DIR": "",
            "OUTLINE_WEBHOOK_SECRET": "whsec",
            "CHUNK_SIZE": "256",
            "CHUNK_OVERLAP": "32",
            "PORT": str(port),
        }
    )
    fake = FakeOutline()
    for doc_id, title, text in DOCS:
        fake.put_doc(doc_id, title, text, "t1")
    app = build_app(
        settings,
        provider=FakeChatProvider(thinking=True),
        embedder=HashEmbedder(dim=256),
        meta=SqliteMetaStore(":memory:"),
        outline_transport=fake.transport(),
        start_workers=True,
    )
    ing = app.state["ingestor"]
    await ing.refresh_all()
    # drain ingestion inline so the index is warm before serving
    bus = app.state["bus"]
    while True:
        item = await bus.pop("task_queue", timeout=0.05)
        if item is None:
            break
        if item["task"] == "process_doc_batch":
            await ing.process_doc_batch(item["ids"])
    print(f"index size: {app.state['index'].size}")
    server = await serve(app, "127.0.0.1", port)
    print(f"dev server on http://127.0.0.1:{port}/chat/")
    async with server:
        await server.serve_forever()


if __name__ == "__main__":
    asyncio.run(main())
