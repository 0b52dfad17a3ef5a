"""End-to-end API tests: the minimum e2e slice (SURVEY.md §7 step 4) —
ingest through the queue + worker, then search through the API, plus the
action/fetch endpoints. Hermetic: fake LLM, tiny encoder, memory store."""

import asyncio
import json
import os

import pytest
from aiohttp.test_utils import TestClient, TestServer

os.environ["MEMEX_FAKE_LLM"] = "1"

from memex_tpu.api.server import create_app
from memex_tpu.config import Settings
from memex_tpu.runtime import Runtime
from memex_tpu.worker import Worker

from test_encoder import tiny_engine


@pytest.fixture
def rt(tmp_path):
    settings = Settings.from_env(
        db_uri=f"sqlite://{tmp_path}/test.db",
        vector_uri="memory://",
        embedding_model="random",
    )
    settings.embedding_dim = 64
    runtime = Runtime(settings)
    runtime._engine = tiny_engine()  # 2-layer 64-d encoder, fast on CPU
    return runtime


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


async def _with_client(rt, fn):
    app = create_app(rt)
    server = TestServer(app)
    client = TestClient(server)
    await client.start_server()
    try:
        return await fn(client)
    finally:
        await client.close()


def test_health(rt):
    async def fn(client):
        resp = await client.get("/api/health")
        assert resp.status == 200
        body = await resp.json()
        assert "version" in body

    run(_with_client(rt, fn))


def test_ingest_then_search_roundtrip(rt):
    """POST doc -> worker drains queue -> GET search returns segments."""
    worker = Worker(rt, poll_interval=0.01)

    async def fn(client):
        resp = await client.post(
            "/api/collections/notes",
            json={"content": "The quick brown fox jumps over the lazy dog. " * 5},
        )
        assert resp.status == 200
        body = await resp.json()
        assert body["status"] == "ok"
        task = body["result"]
        assert task["status"] == "Queued"
        assert task["collection"] == "notes"
        task_id = task["taskId"]

        # Drain the queue synchronously (same process, shared runtime).
        assert worker.drain(timeout=120)

        resp = await client.get(f"/api/tasks/{task_id}")
        body = await resp.json()
        assert body["result"]["status"] == "Completed"

        resp = await client.get(
            "/api/collections/notes/search",
            json={"query": "quick brown fox", "limit": 3},
        )
        assert resp.status == 200
        body = await resp.json()
        results = body["result"]["results"]
        assert len(results) >= 1
        top = results[0]
        assert {"_id", "document_id", "segment", "content", "score"} <= set(top)
        assert "fox" in top["content"]
        assert isinstance(body["time"], float)

    run(_with_client(rt, fn))


def test_delete_collection(rt):
    worker = Worker(rt, poll_interval=0.01)

    async def fn(client):
        await client.post("/api/collections/temp", json={"content": "hello world"})
        assert worker.drain(timeout=60)
        resp = await client.delete("/api/collections/temp")
        assert resp.status == 200
        resp = await client.get(
            "/api/collections/temp/search", json={"query": "hello", "limit": 3}
        )
        body = await resp.json()
        assert body["result"]["results"] == []

    run(_with_client(rt, fn))


def test_task_lifecycle_and_missing(rt):
    async def fn(client):
        resp = await client.get("/api/tasks/99999")
        assert resp.status == 404
        body = await resp.json()
        assert body["status"] == "error"
        resp = await client.get("/api/tasks/notanint")
        assert resp.status == 400

    run(_with_client(rt, fn))


def test_action_ask_plain(rt):
    async def fn(client):
        resp = await client.post(
            "/api/action/ask",
            json={"text": json.dumps({"answer": 42}), "query": "What is the answer?"},
        )
        # FakeLLM echoes; the handler requires valid-JSON responses, so this
        # exercises the non-JSON error path.
        body = await resp.json()
        assert resp.status in (200, 400)
        assert body["status"] in ("ok", "error")

    run(_with_client(rt, fn))


def test_action_ask_with_schema(rt):
    async def fn(client):
        schema = {
            "type": "object",
            "properties": {
                "rating": {"type": "integer"},
                "summary": {"type": "string"},
            },
        }
        resp = await client.post(
            "/api/action/ask",
            json={
                "text": "I rate this product 5 stars. Great quality!",
                "query": "Extract the rating",
                "jsonSchema": schema,
            },
        )
        assert resp.status == 200
        body = await resp.json()
        val = body["result"]["jsonResponse"]
        assert val["rating"] == 5
        assert isinstance(val["summary"], str)

    run(_with_client(rt, fn))

    # invalid schema -> 400
    async def fn2(client):
        resp = await client.post(
            "/api/action/ask",
            json={"text": "x", "query": "y", "jsonSchema": {"type": "nonsense"}},
        )
        assert resp.status == 400

    run(_with_client(rt, fn2))


def test_action_summarize_task(rt):
    worker = Worker(rt, poll_interval=0.01)

    async def fn(client):
        resp = await client.post(
            "/api/action/summarize/task",
            json={"text": "First sentence. Second sentence. Third sentence. Fourth."},
        )
        assert resp.status == 200
        body = await resp.json()
        task_id = body["result"]["taskId"]
        assert body["result"]["collection"] == "tasks"
        assert worker.drain(timeout=60)
        resp = await client.get(f"/api/tasks/{task_id}")
        body = await resp.json()
        assert body["result"]["status"] == "Completed"
        assert "summary" in body["result"]["result"]
        assert "First sentence" in body["result"]["result"]["summary"]

    run(_with_client(rt, fn))


def test_fetch_parse_text(rt):
    import aiohttp

    async def fn(client):
        form = aiohttp.FormData()
        form.add_field("file", b"plain text payload", filename="note.txt")
        resp = await client.post("/api/fetch/parse", data=form)
        assert resp.status == 200
        body = await resp.json()
        assert body["result"]["parsed"] == ["plain text payload"]

    run(_with_client(rt, fn))


def test_error_shape(rt):
    async def fn(client):
        resp = await client.post("/api/collections/x", json={})
        assert resp.status == 400
        body = await resp.json()
        assert body["status"] == "error"
        assert body["result"]["code"] == 400

    run(_with_client(rt, fn))


def test_stats_endpoint(rt):
    async def fn(client):
        await client.post("/api/collections/st", json={"content": "stats doc"})
        resp = await client.get("/api/stats")
        assert resp.status == 200
        body = await resp.json()
        assert body["counters"]["http.POST"] >= 1
        assert "queue" in body and body["queue"].get("Queued", 0) >= 1
        assert "timings" in body

    run(_with_client(rt, fn))


def test_fetch_url_ssrf_guard(rt, monkeypatch):
    """/api/fetch must not be an open proxy (round-2 hardening; the
    reference fetches anything, fetch/handlers.rs:21-41): non-http schemes
    and loopback/private targets are rejected unless explicitly allowed."""
    monkeypatch.delenv("MEMEX_FETCH_ALLOW_PRIVATE", raising=False)

    async def fn(client):
        for url in ("file:///etc/passwd", "gopher://x", "ftp://host/a"):
            resp = await client.get("/api/fetch", params={"url": url})
            assert resp.status == 400
            body = await resp.json()
            msg = body["result"]["message"]
            assert "not allowed" in msg or "scheme" in msg
        # loopback target: resolves but is blocked by the address check
        resp = await client.get(
            "/api/fetch", params={"url": "http://127.0.0.1:1/x"})
        assert resp.status == 400
        body = await resp.json()
        assert "public" in body["result"]["message"]
        # missing host
        resp = await client.get("/api/fetch", params={"url": "http://"})
        assert resp.status == 400

    run(_with_client(rt, fn))


def test_fetch_url_private_allowed_with_env(rt, monkeypatch):
    """MEMEX_FETCH_ALLOW_PRIVATE=1 re-enables internal targets (needed for
    the delegated-store deployments that fetch from cluster-local nodes);
    the request then proceeds to the socket (and fails with a connection
    error, not a policy error, against a closed port)."""
    monkeypatch.setenv("MEMEX_FETCH_ALLOW_PRIVATE", "1")

    async def fn(client):
        resp = await client.get(
            "/api/fetch", params={"url": "http://127.0.0.1:9/x"})
        assert resp.status == 400
        body = await resp.json()
        assert "public" not in body["result"]["message"]  # policy ok; socket failed

    run(_with_client(rt, fn))
