"""HTTP serving layer.

First-party replacement for the reference's FastAPI + uvicorn stack
(reference ``app/main.py``): a small asyncio HTTP/1.1 framework
(``serve.http``) with routing, signed-cookie sessions, SSE streaming and
static files, plus the full ``/chat`` API surface (``serve.app``):
identity/models, conversations, messages, ask-with-citations (SSE),
upload, refresh trigger/status, webhook, OIDC login, healthz.
"""

from outline_rag_tpu.serve.http import App, Request, Response
from outline_rag_tpu.serve.app import build_app

__all__ = ["App", "Request", "Response", "build_app"]
