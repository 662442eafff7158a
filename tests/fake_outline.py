"""In-process fake Outline server (httpx.MockTransport handler).

The paginated documents.list / documents.info / documents.export fixture
replay prescribed by SURVEY.md section 4 for exercising the delta-sync
protocol without a wiki.
"""

from __future__ import annotations

import json

import httpx


class FakeOutline:
    def __init__(self, page_size: int = 100):
        self.docs: dict[str, dict] = {}
        self.page_size = page_size
        self.calls: list[str] = []

    def put_doc(
        self,
        doc_id: str,
        title: str,
        text: str,
        updated_at: str,
        collection: str = "col-default",
    ):
        self.docs[doc_id] = {
            "id": doc_id,
            "title": title,
            "text": text,
            "updatedAt": updated_at,
            "url": f"/doc/{doc_id}",
            "collectionId": collection,
        }

    def delete_doc(self, doc_id: str):
        self.docs.pop(doc_id, None)

    def transport(self) -> httpx.MockTransport:
        return httpx.MockTransport(self._handle)

    def _handle(self, request: httpx.Request) -> httpx.Response:
        endpoint = request.url.path.split("/api/")[-1]
        self.calls.append(endpoint)
        payload = json.loads(request.content or b"{}")
        if endpoint == "collections.list":
            cols = sorted({d["collectionId"] for d in self.docs.values()})
            return httpx.Response(
                200,
                json={"data": [{"id": c, "name": c} for c in cols]},
            )
        if endpoint == "documents.list":
            offset = payload.get("offset", 0)
            limit = payload.get("limit", self.page_size)
            coll = payload.get("collectionId")
            docs = sorted(self.docs.values(), key=lambda d: d["id"])
            if coll is not None:
                docs = [d for d in docs if d["collectionId"] == coll]
            page = [
                {k: d[k] for k in ("id", "title", "updatedAt", "url")}
                for d in docs[offset : offset + limit]
            ]
            return httpx.Response(200, json={"data": page})
        if endpoint == "documents.info":
            d = self.docs.get(payload.get("id"))
            if d is None:
                return httpx.Response(404, json={"error": "not found"})
            return httpx.Response(
                200,
                json={"data": {k: d[k] for k in ("id", "title", "updatedAt", "url")}},
            )
        if endpoint == "documents.export":
            d = self.docs.get(payload.get("id"))
            if d is None:
                return httpx.Response(404, json={"error": "not found"})
            return httpx.Response(200, json={"data": d["text"]})
        return httpx.Response(404, json={"error": "unknown endpoint"})
