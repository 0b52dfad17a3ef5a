"""Prompt builders (reference lib/libmemex/src/llm/prompter.rs:8-48 with
handlebars templates under lib/libmemex/prompts/). Templates here are
original text with the same roles: quick question, per-chunk summarize,
JSON-schema-constrained extraction."""

from __future__ import annotations

import json

from .base import ChatMessage, ChatRole

_QQ_SYSTEM = (
    "You are a precise assistant. Answer the user's request directly and "
    "concisely using only the provided content when content is given."
)

_SUMMARIZE_SYSTEM = (
    "You are an expert summarizer. Produce a faithful, compact summary of "
    "the supplied text as 3-6 bullet points. Do not invent facts."
)

_SUMMARIZE_USER = "Summarize the following text:\n\n---\n{text}\n---"

_SCHEMA_SYSTEM = (
    "You extract structured data. Respond with a single JSON value that "
    "validates against the provided JSON Schema. Output raw JSON only - no "
    "prose, no code fences."
)

_SCHEMA_USER = (
    "JSON Schema:\n{schema}\n\n"
    "Request: {query}\n\n"
    "Extract the data described by the schema from this text:\n\n"
    "---\n{text}\n---\n\nJSON:"
)


def quick_question(request: str) -> list[ChatMessage]:
    return [
        ChatMessage(ChatRole.System, _QQ_SYSTEM),
        ChatMessage(ChatRole.User, request),
    ]


def summarize(text: str) -> list[ChatMessage]:
    return [
        ChatMessage(ChatRole.System, _SUMMARIZE_SYSTEM),
        ChatMessage(ChatRole.User, _SUMMARIZE_USER.format(text=text)),
    ]


def json_schema_extraction(text: str, query: str, schema: dict | str) -> list[ChatMessage]:
    """(reference prompter::json_schema_extraction takes content, the user
    request, and the schema — lib/api/src/endpoints/actions/handlers.rs:31)."""
    schema_str = schema if isinstance(schema, str) else json.dumps(schema, indent=2)
    return [
        ChatMessage(ChatRole.System, _SCHEMA_SYSTEM),
        ChatMessage(
            ChatRole.User,
            _SCHEMA_USER.format(schema=schema_str, query=query, text=text),
        ),
    ]
