#!/bin/sh
# Container entrypoint: generate an ephemeral SECRET_KEY when none is
# provided (sessions won't survive restarts — set one in production), then
# exec the server. Single process by design: the TPU chip is owned by one
# runtime and concurrency comes from the asyncio loop + the query
# micro-batcher (see README "Running").
set -e

if [ -z "$SECRET_KEY" ]; then
    SECRET_KEY=$(python - <<'PY'
import secrets
print(secrets.token_urlsafe(48))
PY
)
    export SECRET_KEY
    echo "entrypoint: generated ephemeral SECRET_KEY" >&2
fi

exec python -m outline_rag_tpu
