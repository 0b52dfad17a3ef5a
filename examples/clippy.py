#!/usr/bin/env python
"""clippy — example RAG CLI against a running memex_tpu service.

Parity with the reference example (examples/clippy/src/main.rs:11-29):
  load-file <path>   POST file contents into the `clippy` collection
  ask <question>     top-2 semantic search -> prompt w/ context -> LLM answer
  qq <question>      quick question, no retrieval
  forget             DELETE the `clippy` collection

The reference runs a local GGML model client-side with live token output
(clippy/src/lib.rs:109-185, handle_llm_events :83-107). Two modes here:
  default            LLM calls go through the service's /api/action/ask;
  --local-llm CFG    run the local JAX Llama client-side from a TOML config
                     and print tokens LIVE as they stream off the device.
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import sys
import time

import requests

DEFAULT_HOST = "http://127.0.0.1:8181"
COLLECTION = "clippy"

PROMPT_TEMPLATE = """Today's date: {today}

Use the following context to answer the question at the end. If the context
is not helpful, answer from general knowledge and say so.

Context:
{context}

Question: {question}
"""


def health_check(host: str) -> None:
    try:
        resp = requests.get(f"{host}/api/health", timeout=5)
        resp.raise_for_status()
    except Exception as exc:
        print(f"error: memex service not reachable at {host} ({exc})", file=sys.stderr)
        sys.exit(1)


def wait_for_task(host: str, task_id: int, timeout: float = 300.0) -> dict:
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        resp = requests.get(f"{host}/api/tasks/{task_id}", timeout=10)
        result = resp.json().get("result") or {}
        if resp.status_code != 200 or "status" not in result:
            # Error envelope ({code, message}) or transient 5xx: surface a
            # readable message instead of a KeyError traceback.
            msg = result.get("message", f"HTTP {resp.status_code}")
            if resp.status_code == 404:
                raise RuntimeError(f"task {task_id} not found: {msg}")
            time.sleep(0.5)  # transient server error: keep polling
            continue
        if result["status"] in ("Completed", "Failed"):
            return result
        time.sleep(0.5)
    raise TimeoutError(f"task {task_id} still pending after {timeout}s")


def cmd_load_file(host: str, path: str) -> int:
    with open(path, "r", encoding="utf-8", errors="replace") as fh:
        content = fh.read()
    resp = requests.post(
        f"{host}/api/collections/{COLLECTION}", json={"content": content}, timeout=30
    )
    resp.raise_for_status()
    task = resp.json()["result"]
    print(f"queued task {task['taskId']}; waiting for ingest...")
    result = wait_for_task(host, task["taskId"])
    print(f"ingest {result['status'].lower()}")
    return 0 if result["status"] == "Completed" else 1


def search_context(host: str, question: str, limit: int = 2) -> list[dict]:
    # top-2 context, same as the reference (clippy main.rs:209)
    resp = requests.get(
        f"{host}/api/collections/{COLLECTION}/search",
        params={"query": question, "limit": limit},
        timeout=60,
    )
    resp.raise_for_status()
    return resp.json()["result"]["results"]


def llm_answer(host: str, prompt: str) -> str:
    resp = requests.post(
        f"{host}/api/action/ask",
        json={"text": prompt, "query": "Answer the question in the text."},
        timeout=300,
    )
    body = resp.json()
    if body.get("status") != "ok":
        return f"(llm error: {body.get('result', {}).get('message')})"
    val = body["result"]["jsonResponse"]
    return val if isinstance(val, str) else json.dumps(val, indent=2)


_LOCAL_LLM = None


def llm_answer_local(cfg_path: str, prompt: str) -> str:
    """Client-side local JAX LLM with live token streaming (parity with
    ask_clippy + handle_llm_events, clippy/src/lib.rs:109-185, :83-107)."""
    global _LOCAL_LLM
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from memex_tpu.llm.base import ChatMessage, ChatRole
    from memex_tpu.llm.local import LocalLLM

    if _LOCAL_LLM is None:
        print("loading local model...", file=sys.stderr)
        _LOCAL_LLM = LocalLLM.from_config(cfg_path)
    llm = _LOCAL_LLM
    t0 = time.perf_counter()

    def emit(piece: str) -> None:
        print(piece, end="", flush=True)  # live, token by token

    text = llm.chat_completion(
        llm.default_model, [ChatMessage(ChatRole.User, prompt)], on_token=emit
    )
    print(f"\n[predict time: {(time.perf_counter() - t0) * 1e3:.0f}ms]", file=sys.stderr)
    return text


def cmd_ask(host: str, question: str, local_llm: str | None = None) -> int:
    t0 = time.perf_counter()
    segments = search_context(host, question)
    context = "\n---\n".join(s["content"] for s in segments) or "(no documents loaded)"
    prompt = PROMPT_TEMPLATE.format(
        today=dt.date.today().isoformat(), context=context, question=question
    )
    if local_llm:
        llm_answer_local(local_llm, prompt)  # streams to stdout itself
    else:
        print(llm_answer(host, prompt))
    print(f"\n[{len(segments)} context segments, {time.perf_counter() - t0:.2f}s]")
    return 0


def cmd_qq(host: str, question: str, local_llm: str | None = None) -> int:
    if local_llm:
        llm_answer_local(local_llm, question)
    else:
        print(llm_answer(host, question))
    return 0


def cmd_forget(host: str) -> int:
    resp = requests.delete(f"{host}/api/collections/{COLLECTION}", timeout=60)
    resp.raise_for_status()
    print(f"collection '{COLLECTION}' deleted")
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="clippy", description=__doc__)
    parser.add_argument("--host", default=DEFAULT_HOST)
    parser.add_argument(
        "--local-llm", default=None, metavar="CFG",
        help="TOML model config: answer client-side with live token streaming",
    )
    sub = parser.add_subparsers(dest="command", required=True)
    p = sub.add_parser("load-file")
    p.add_argument("path")
    p = sub.add_parser("ask")
    p.add_argument("question")
    p = sub.add_parser("qq")
    p.add_argument("question")
    sub.add_parser("forget")
    args = parser.parse_args(argv)

    health_check(args.host)
    if args.command == "load-file":
        return cmd_load_file(args.host, args.path)
    if args.command == "ask":
        return cmd_ask(args.host, args.question, args.local_llm)
    if args.command == "qq":
        return cmd_qq(args.host, args.question, args.local_llm)
    if args.command == "forget":
        return cmd_forget(args.host)
    return 2


if __name__ == "__main__":
    sys.exit(main())
