"""TEST-ONLY differential oracle for the recursive character splitter.

An independent, line-faithful transcription of the published (MIT-licensed)
LangChain ``RecursiveCharacterTextSplitter`` semantics — the algorithm the
reference invokes verbatim (``fdp/services/chunking_service.py:127-163``)
with ``separators=["\\n\\n", "\\n", ". ", " ", ""]``, ``chunk_size=1000``,
``chunk_overlap=200``. Fixed behavior flags match the reference's usage:
``keep_separator=True`` (separator attaches to the START of the following
piece), ``strip_whitespace=True``, ``is_separator_regex=False``,
``length_function=len``.

This module is NOT part of the engine: ``operators/chunker.py`` implements
the algorithm from the published description; this transcription exists so
``tests/test_chunker_differential.py`` can pin byte-parity between the two
(VERDICT r2 #1 / r3 #2 — the sandbox has no ``langchain-text-splitters``
wheel, so a transcription of the published code is the closest available
golden implementation).
"""

from __future__ import annotations

import re


def _split_text_with_regex(text: str, separator: str, keep_separator: bool) -> list[str]:
    if separator:
        if keep_separator:
            _splits = re.split(f"({separator})", text)
            splits = [_splits[i] + _splits[i + 1] for i in range(1, len(_splits), 2)]
            if len(_splits) % 2 == 0:
                splits += _splits[-1:]
            splits = [_splits[0]] + splits
        else:
            splits = re.split(separator, text)
    else:
        splits = list(text)
    return [s for s in splits if s != ""]


class OracleRecursiveSplitter:
    def __init__(
        self,
        chunk_size: int = 1000,
        chunk_overlap: int = 200,
        separators: list[str] | None = None,
    ) -> None:
        if chunk_overlap > chunk_size:
            raise ValueError("chunk_overlap must be <= chunk_size")
        self._chunk_size = chunk_size
        self._chunk_overlap = chunk_overlap
        self._separators = separators if separators is not None else ["\n\n", "\n", " ", ""]
        self._keep_separator = True
        self._strip_whitespace = True

    # --- base TextSplitter._join_docs / _merge_splits ---------------------

    def _join_docs(self, docs: list[str], separator: str) -> str | None:
        text = separator.join(docs)
        if self._strip_whitespace:
            text = text.strip()
        if text == "":
            return None
        return text

    def _merge_splits(self, splits: list[str], separator: str) -> list[str]:
        separator_len = len(separator)
        docs: list[str] = []
        current_doc: list[str] = []
        total = 0
        for d in splits:
            _len = len(d)
            if total + _len + (separator_len if len(current_doc) > 0 else 0) > self._chunk_size:
                if len(current_doc) > 0:
                    doc = self._join_docs(current_doc, separator)
                    if doc is not None:
                        docs.append(doc)
                    # Keep popping while: we exceed the overlap budget, or we
                    # still exceed chunk_size with the incoming split
                    while total > self._chunk_overlap or (
                        total + _len + (separator_len if len(current_doc) > 0 else 0)
                        > self._chunk_size
                        and total > 0
                    ):
                        total -= len(current_doc[0]) + (
                            separator_len if len(current_doc) > 1 else 0
                        )
                        current_doc = current_doc[1:]
            current_doc.append(d)
            total += _len + (separator_len if len(current_doc) > 1 else 0)
        doc = self._join_docs(current_doc, separator)
        if doc is not None:
            docs.append(doc)
        return docs

    # --- RecursiveCharacterTextSplitter._split_text -----------------------

    def _split_text(self, text: str, separators: list[str]) -> list[str]:
        final_chunks: list[str] = []
        separator = separators[-1]
        new_separators: list[str] = []
        for i, _s in enumerate(separators):
            _separator = re.escape(_s)
            if _s == "":
                separator = _s
                break
            if re.search(_separator, text):
                separator = _s
                new_separators = separators[i + 1 :]
                break
        _separator = re.escape(separator)
        splits = _split_text_with_regex(text, _separator, self._keep_separator)
        _good_splits: list[str] = []
        _separator = "" if self._keep_separator else separator
        for s in splits:
            if len(s) < self._chunk_size:
                _good_splits.append(s)
            else:
                if _good_splits:
                    merged_text = self._merge_splits(_good_splits, _separator)
                    final_chunks.extend(merged_text)
                    _good_splits = []
                if not new_separators:
                    final_chunks.append(s)
                else:
                    other_info = self._split_text(s, new_separators)
                    final_chunks.extend(other_info)
        if _good_splits:
            merged_text = self._merge_splits(_good_splits, _separator)
            final_chunks.extend(merged_text)
        return final_chunks

    def split_text(self, text: str) -> list[str]:
        return self._split_text(text, self._separators)
