"""Process entrypoint.

Startup semantics of the reference lifespan (reference
``app/main.py:92-127``): config validation (SECRET_KEY required outside
dev, webhook secret required when signing is on — reference
``main.py:99-104``), data dir creation, store init, background worker
spawn; then the asyncio HTTP server (replacing uvicorn).

Run: ``python -m outline_rag_tpu``
"""

from __future__ import annotations

import logging
import os
import sys

from outline_rag_tpu.config import load_settings
from outline_rag_tpu.serve.app import build_app
from outline_rag_tpu.serve.http import run
from outline_rag_tpu.utils.logging import setup_logging

log = logging.getLogger(__name__)


def main() -> None:
    settings = load_settings()
    setup_logging(settings.log_level)
    if not settings.secret_key:
        if os.environ.get("ALLOW_INSECURE_DEV") == "1":
            log.warning("SECRET_KEY unset; using insecure dev secret")
        else:
            log.error("SECRET_KEY must be set (or ALLOW_INSECURE_DEV=1)")
            sys.exit(1)
    if settings.outline_webhook_sign and settings.outline_api_url and not settings.outline_webhook_secret:
        log.error(
            "OUTLINE_WEBHOOK_SECRET must be set when OUTLINE_WEBHOOK_SIGN=true"
        )
        sys.exit(1)
    os.makedirs(settings.data_dir, exist_ok=True)
    os.makedirs(settings.attachments_dir, exist_ok=True)
    app = build_app(settings)
    log.info(
        "starting %s on %s:%d (index dtype=%s capacity=%d, fused=%s)",
        settings.app_name,
        settings.host,
        settings.port,
        settings.index_dtype,
        settings.shard_capacity,
        app.state["retrieval"].fused,
    )
    run(app, settings.host, settings.port)


if __name__ == "__main__":
    main()
