"""LLM extraction / content-filter PLUMBING (G10/G9 last tier).

Re-expresses the reference's ``LLMExtractionStrategy``
(extraction_strategy.py:476-760) and ``LLMContentFilter``
(content_filter_strategy.py:772-980) as Spark stages around a PLUGGABLE
completion function.  Everything the reference does *around* the model is
real and tested here:

  * token-budget chunk merging with overlap carry-over
    (utils.py:132-188 ``merge_chunks`` — including its quirks: the
    word→token rate only scales the chunk-count estimate while the
    distribution loop counts raw whitespace tokens, and docs whose scaled
    count rounds to 0 are skipped entirely);
  * prompt assembly via literal ``{VAR}`` substitution on a pluggable
    template (the reference's built-in templates live in its prompts.py —
    pass them in for drop-in parity; the default template here is a
    minimal original one, since no model in this sandbox checks wording);
  * response parsing: ``<blocks>``-wrapped JSON (utils.py:1554
    ``extract_xml_data``) with the brace-depth-scan fallback
    (utils.py:671 ``split_and_parse_json_objects``) and the error-block
    convention on unparseable tails;
  * per-(url, section) fan-out and block explode, deterministic in
    section order (the reference's ``as_completed`` collection order is
    nondeterministic — extraction_strategy.py:720 — ours is the sorted
    determinization, documented divergence).

The model call itself is a batch-level callable ``complete_fn:
list[str] -> list[str]`` invoked ONCE per Arrow batch with every prompt
in the batch — exactly the shape a vLLM/endpoint client wants at scale
(no per-row round trips).  Passing ``complete_fn=None`` raises
``NotImplementedError`` at plan-build time, mirroring the honest codec
stubs in operators/multimodal.py: no LLM is available in this sandbox;
tests drive the plumbing with deterministic fakes.
"""

from __future__ import annotations

import json
import re
from typing import Callable, Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame

# Reference defaults (config.py:34-36).
CHUNK_TOKEN_THRESHOLD = 2 ** 11
OVERLAP_RATE = 0.1
WORD_TOKEN_RATE = 1.3

CompleteFn = Callable[[list[str]], list[str]]


# ------------------------------------------------------------------ chunking

def merge_chunks(docs: Sequence[str], target_size: int, overlap: int = 0,
                 word_token_ratio: float = 1.0) -> list[str]:
    """Token-budget merge of documents into sections (utils.py:132-188).

    Semantic twin, re-derived: per-doc token counts are
    ``int(len(tokens) * ratio)`` and zero-count docs are dropped; the
    total of those scaled counts fixes the chunk-count ceiling
    ``max(1, ceil(total/target))``; tokens are then dealt out counting 1
    per raw token, rolling to the next chunk once ``target_size`` is
    reached (never past the ceiling), carrying the last ``overlap`` raw
    tokens forward into the new chunk.
    """
    kept: list[list[str]] = []
    total = 0
    for doc in docs:
        toks = doc.split()
        scaled = int(len(toks) * word_token_ratio)
        if scaled:
            kept.append(toks)
            total += scaled
    if not total:
        return []
    n_chunks = max(1, -(-total // target_size))
    chunks: list[list[str]] = [[]]
    size = 0
    for tok in (t for toks in kept for t in toks):
        if size >= target_size and len(chunks) < n_chunks:
            carry = chunks[-1][-overlap:] if overlap > 0 else []
            chunks.append(list(carry))
            size = len(carry)
        chunks[-1].append(tok)
        size += 1
    return [" ".join(c) for c in chunks if c]


# ------------------------------------------------------------------- parsing

def extract_tag(tag: str, s: str) -> str:
    """First ``<tag>…</tag>`` span, stripped; '' when absent (utils.py:1554)."""
    m = re.search(f"<{tag}>(.*?)</{tag}>", s, re.DOTALL)
    return m.group(1).strip() if m else ""


def split_json_objects(s: str) -> tuple[list[dict], list[str]]:
    """Brace-depth scan for top-level ``{…}`` segments; (parsed, unparsed)
    (utils.py:671-714). Trims one enclosing ``[`` ``]`` first."""
    if s.startswith("[") and s.endswith("]"):
        s = s[1:-1].strip()
    parsed, unparsed = [], []
    depth, start = 0, 0
    for i, ch in enumerate(s):
        if ch == "{":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0:
                seg = s[start:i + 1]
                try:
                    parsed.append(json.loads(seg))
                except json.JSONDecodeError:
                    unparsed.append(seg)
    return parsed, unparsed


def parse_blocks(response: str) -> list[dict]:
    """Response → block dicts (extraction_strategy.py:644-662): prefer the
    ``<blocks>`` JSON payload; fall back to the depth-scan; unparseable
    remainder becomes one error block."""
    try:
        blocks = json.loads(extract_tag("blocks", response))
        if not isinstance(blocks, list):
            blocks = [blocks]
        for b in blocks:
            b["error"] = False
        return blocks
    except Exception:
        parsed, unparsed = split_json_objects(response)
        for b in parsed:
            b.setdefault("error", False)
        if unparsed:
            parsed.append({"index": 0, "error": True, "tags": ["error"],
                           "content": unparsed})
        return parsed


# ------------------------------------------------------------ prompt builds

DEFAULT_EXTRACT_TEMPLATE = (
    "Extract the meaningful blocks from this page as a JSON list wrapped "
    "in <blocks></blocks>.\nURL: {URL}\nCONTENT:\n{HTML}\n"
    "INSTRUCTION: {REQUEST}\nSCHEMA: {SCHEMA}\n"
)

DEFAULT_FILTER_TEMPLATE = (
    "Rewrite the relevant parts of this page as markdown inside "
    "<content></content>.\nINSTRUCTION: {REQUEST}\nCONTENT:\n{HTML}\n"
)


def _escape_for_prompt(s: str) -> str:
    """sanitize_html + escape_json_string composition the reference applies
    to the HTML variable (utils.py:716-780): quote-escape, then JSON
    control-character escapes (backslash first)."""
    s = s.replace('"', '\\"').replace("'", "\\'")
    s = s.replace("\\", "\\\\").replace('"', '\\"')
    for raw, esc in (("\b", "\\b"), ("\f", "\\f"), ("\n", "\\n"),
                     ("\r", "\\r"), ("\t", "\\t")):
        s = s.replace(raw, esc)
    return s


def build_prompt(template: str, url: str, content: str,
                 instruction: str | None = None,
                 schema: dict | None = None) -> str:
    """Literal ``{VAR}`` substitution, replace() not format() — a ``{URL}``
    inside the page content is substituted too, faithfully to
    extraction_strategy.py:612-616."""
    values = {"URL": url, "HTML": _escape_for_prompt(content),
              "REQUEST": instruction or "",
              "SCHEMA": json.dumps(schema, indent=2) if schema else ""}
    out = template
    for var, val in values.items():
        out = out.replace("{" + var + "}", val)
    return out


# ------------------------------------------------------------------- stages

LLM_EXTRACT_SCHEMA = (
    "url string, section_idx int, block_idx long, tags array<string>, "
    "content string, error boolean"
)


def llm_extract_stage(df: DataFrame, complete_fn: CompleteFn | None,
                      instruction: str | None = None,
                      schema: dict | None = None,
                      template: str = DEFAULT_EXTRACT_TEMPLATE,
                      url_col: str = "url", text_col: str = "text",
                      chunk_token_threshold: int = CHUNK_TOKEN_THRESHOLD,
                      overlap_rate: float = OVERLAP_RATE,
                      word_token_rate: float = WORD_TOKEN_RATE,
                      apply_chunking: bool = True) -> DataFrame:
    """LLMExtractionStrategy as one Arrow stage: page text → merged
    sections → prompts → ONE ``complete_fn`` call per Arrow batch → parsed
    blocks exploded to rows.

    Output: (url, section_idx, block_idx, tags, content, error) — the
    reference's block dicts with their ``index`` surfaced as block_idx.
    Partitioning: inherits the input's; at scale repartition upstream so
    Arrow batches fill the inference server's batch size
    (``spark.sql.execution.arrow.maxRecordsPerBatch`` is pages per batch;
    sections per page multiply inside).
    """
    if complete_fn is None:
        # STUB surface: no LLM endpoint exists in this sandbox.  A real
        # deployment passes e.g. a vLLM/OpenAI-batch client here.
        raise NotImplementedError(
            "llm_extract_stage requires a complete_fn (no LLM in sandbox); "
            "tests inject deterministic fakes")
    threshold = chunk_token_threshold if apply_chunking else (1 << 62)
    overlap = int(chunk_token_threshold * overlap_rate)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            meta: list[tuple[str, int]] = []
            prompts: list[str] = []
            for r in b.itertuples():
                text = getattr(r, text_col) or ""
                url = getattr(r, url_col)
                sections = merge_chunks([text], threshold, overlap,
                                        word_token_rate)
                for ix, sec in enumerate(sections):
                    meta.append((url, ix))
                    prompts.append(build_prompt(template, url, sec,
                                                instruction, schema))
            responses = list(complete_fn(prompts)) if prompts else []
            if len(responses) != len(prompts):
                raise ValueError(
                    f"complete_fn returned {len(responses)} responses for "
                    f"{len(prompts)} prompts")
            rows = []
            for (url, ix), resp in zip(meta, responses):
                for blk in parse_blocks(resp):
                    content = blk.get("content", "")
                    if isinstance(content, list):
                        content = "\n".join(str(c) for c in content)
                    rows.append({
                        "url": url, "section_idx": ix,
                        "block_idx": int(blk.get("index", 0)),
                        "tags": [str(t) for t in blk.get("tags", [])],
                        "content": str(content),
                        "error": bool(blk.get("error", False)),
                    })
            yield pd.DataFrame(
                rows, columns=["url", "section_idx", "block_idx", "tags",
                               "content", "error"])

    return df.select(url_col, text_col).mapInPandas(run, LLM_EXTRACT_SCHEMA)


LLM_FILTER_SCHEMA = "url string, section_idx int, markdown string"


def llm_content_filter_stage(df: DataFrame, complete_fn: CompleteFn | None,
                             instruction: str | None = None,
                             template: str = DEFAULT_FILTER_TEMPLATE,
                             url_col: str = "url", text_col: str = "text",
                             chunk_token_threshold: int = int(1e9),
                             overlap_rate: float = OVERLAP_RATE,
                             word_token_rate: float = WORD_TOKEN_RATE,
                             ) -> DataFrame:
    """LLMContentFilter plumbing (content_filter_strategy.py:875-980):
    chunk → prompt → completion → ``<content>`` payload per section.
    Default threshold 1e9 = effectively one section per page, matching the
    reference default.  Empty/None text yields no rows (filter_content's
    early return)."""
    if complete_fn is None:
        raise NotImplementedError(
            "llm_content_filter_stage requires a complete_fn (no LLM in "
            "sandbox); tests inject deterministic fakes")
    overlap = int(chunk_token_threshold * overlap_rate)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            meta: list[tuple[str, int]] = []
            prompts: list[str] = []
            for r in b.itertuples():
                text = getattr(r, text_col)
                if not text:
                    continue
                url = getattr(r, url_col)
                for ix, sec in enumerate(merge_chunks(
                        [text], chunk_token_threshold, overlap,
                        word_token_rate)):
                    meta.append((url, ix))
                    prompts.append(build_prompt(template, url, sec,
                                                instruction))
            responses = list(complete_fn(prompts)) if prompts else []
            if len(responses) != len(prompts):
                raise ValueError(
                    f"complete_fn returned {len(responses)} responses for "
                    f"{len(prompts)} prompts")
            rows = [{"url": url, "section_idx": ix,
                     "markdown": extract_tag("content", resp)}
                    for (url, ix), resp in zip(meta, responses)]
            yield pd.DataFrame(rows, columns=["url", "section_idx",
                                              "markdown"])

    return df.select(url_col, text_col).mapInPandas(run, LLM_FILTER_SCHEMA)
