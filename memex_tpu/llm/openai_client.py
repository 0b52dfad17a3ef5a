"""OpenAI chat-completions client.

Parity with the reference client (lib/libmemex/src/llm/openai/mod.rs):
token-budget constants (:15-18), model tiers + escalation in segment/
truncate (:143-186), temperature 0.2 / max_tokens 1024 request shape
(:49-78), context_length_exceeded error mapping (openai/schema.rs:3-60).
Pure stdlib+requests; no SDK dependency.
"""

from __future__ import annotations

import json
import time

import requests

from ..log import get_logger
from .base import (
    ChatMessage,
    ContextLengthExceeded,
    InferenceError,
    budget_segment,
    budget_truncate,
)
from ..text.segment import count_tokens

logger = get_logger(__name__)

# Budget layout mirrors the reference: context - response budget - overhead
# (openai/mod.rs:15-18).
RESPONSE_BUDGET = 1024
PROMPT_OVERHEAD = 100
MODEL_TIERS = [
    # (model, context window) — escalation order parity with the
    # reference (openai/mod.rs:143-186): fit -> 3.5, bigger -> 16k.
    ("gpt-3.5-turbo", 4097),
    ("gpt-3.5-turbo-16k", 16384),
]
# Full model table parity (openai/mod.rs:20-37): gpt-4 is listed by the
# reference but, like there, takes no part in automatic escalation — use
# it via default_model / OPENAI_MODEL.
KNOWN_MODELS = {
    "gpt-3.5-turbo": 4097,
    "gpt-3.5-turbo-16k": 16384,
    "gpt-3.5-turbo-0613": 4097,
    "gpt-4": 8192,
}


def budget_for(context: int) -> int:
    return context - RESPONSE_BUDGET - PROMPT_OVERHEAD


class OpenAIClient:
    def __init__(
        self,
        api_key: str,
        base_url: str = "https://api.openai.com/v1",
        default_model: str = "gpt-3.5-turbo",
        timeout: float = 120.0,
        max_retries: int = 3,
    ):
        self.api_key = api_key
        self.base_url = base_url.rstrip("/")
        self._default_model = default_model
        self.timeout = timeout
        self.max_retries = max_retries
        self._session = requests.Session()

    @property
    def default_model(self) -> str:
        return self._default_model

    def chat_completion(self, model: str, messages: list[ChatMessage]) -> str:
        body = {
            "model": model,
            "messages": [m.as_dict() for m in messages],
            "temperature": 0.2,   # reference openai/mod.rs:66
            "max_tokens": RESPONSE_BUDGET,
        }
        last_err: Exception | None = None
        for attempt in range(self.max_retries):
            try:
                resp = self._session.post(
                    f"{self.base_url}/chat/completions",
                    headers={
                        "Authorization": f"Bearer {self.api_key}",
                        "Content-Type": "application/json",
                    },
                    data=json.dumps(body),
                    timeout=self.timeout,
                )
            except requests.RequestException as exc:
                last_err = InferenceError(f"request failed: {exc}")
                time.sleep(min(2**attempt, 8))
                continue
            if resp.status_code == 200:
                payload = resp.json()
                choices = payload.get("choices") or []
                if not choices:
                    raise InferenceError("no choices in response")
                return choices[0]["message"]["content"]
            try:
                err = resp.json().get("error", {})
            except Exception:
                err = {"message": resp.text[:500]}
            code = err.get("code") or err.get("type") or ""
            if code == "context_length_exceeded":
                raise ContextLengthExceeded(err.get("message", ""))
            if resp.status_code in (429, 500, 502, 503):
                last_err = InferenceError(f"{resp.status_code}: {err.get('message', '')}")
                time.sleep(min(2**attempt, 8))
                continue
            raise InferenceError(f"{resp.status_code}: {err.get('message', '')}")
        raise last_err or InferenceError("exhausted retries")

    # -- budgeting (reference openai/mod.rs:143-186) --------------------------

    def segment_text(self, text: str) -> tuple[list[str], str]:
        n = count_tokens(text)
        for model, ctx in MODEL_TIERS:
            if n <= budget_for(ctx):
                return [text], model
        model, ctx = MODEL_TIERS[-1]
        return budget_segment(text, budget_for(ctx)), model

    def truncate_text(self, text: str) -> tuple[str, str]:
        n = count_tokens(text)
        for model, ctx in MODEL_TIERS:
            if n <= budget_for(ctx):
                return text, model
        model, ctx = MODEL_TIERS[-1]
        return budget_truncate(text, budget_for(ctx)), model
