"""FakeLLM — deterministic offline model for hermetic tests and zero-egress
environments.

The reference has no offline LLM path: its OpenAI/GGML tests are #[ignore]d
(SURVEY.md §4). This fake understands the three prompter shapes well enough
for end-to-end API tests: JSON-schema prompts get a schema-conforming
object, summarize prompts get leading-sentence bullets, everything else
gets a deterministic echo answer.
"""

from __future__ import annotations

import json
import re

from .base import ChatMessage, budget_segment, budget_truncate

_CONTEXT = 4096
_BUDGET = _CONTEXT - 1024 - 100


def _fill_from_schema(schema: dict, text: str):
    t = schema.get("type")
    if t == "object" or "properties" in schema:
        return {
            key: _fill_from_schema(sub, text)
            for key, sub in (schema.get("properties") or {}).items()
        }
    if t == "array":
        item = schema.get("items", {"type": "string"})
        return [_fill_from_schema(item, text)]
    if t in ("number", "integer"):
        m = re.search(r"-?\d+(\.\d+)?", text)
        val = float(m.group()) if m else 0
        return int(val) if t == "integer" else val
    if t == "boolean":
        return True
    words = text.split()
    return " ".join(words[:8]) if words else "unknown"


class FakeLLM:
    def __init__(self, model_name: str = "fake-llm"):
        self._model = model_name

    @property
    def default_model(self) -> str:
        return self._model

    def chat_completion(self, model: str, messages: list[ChatMessage]) -> str:
        system = next((m.content for m in messages if m.role.value == "system"), "")
        user = next((m.content for m in reversed(messages) if m.role.value == "user"), "")
        if "JSON Schema" in user or "JSON" in system and "schema" in system.lower():
            m = re.search(r"JSON Schema:\n(.*?)\n\n(?:Request:|Extract)", user, re.S)
            schema = {}
            if m:
                try:
                    schema = json.loads(m.group(1))
                except json.JSONDecodeError:
                    schema = {}
            tm = re.search(r"---\n(.*?)\n---", user, re.S)
            text = tm.group(1) if tm else user
            return json.dumps(_fill_from_schema(schema, text))
        if "summar" in system.lower():
            tm = re.search(r"---\n(.*?)\n---", user, re.S)
            text = tm.group(1) if tm else user
            sentences = re.split(r"(?<=[.!?])\s+", text.strip())
            bullets = [f"- {s.strip()}" for s in sentences[:3] if s.strip()]
            return "\n".join(bullets) if bullets else "- (empty)"
        words = user.split()
        # JSON-encoded so the /api/action/ask handler (which, like the
        # reference's handle_extract, requires the completion to parse as
        # JSON) succeeds on the no-schema path in hermetic environments.
        return json.dumps("Answer: " + " ".join(words[:24]))

    def segment_text(self, text: str) -> tuple[list[str], str]:
        return budget_segment(text, _BUDGET), self._model

    def truncate_text(self, text: str) -> tuple[str, str]:
        return budget_truncate(text, _BUDGET), self._model
