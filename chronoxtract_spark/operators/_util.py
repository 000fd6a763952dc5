"""Shared operator-package helpers."""

from __future__ import annotations


def keylist(keys: list[str] | str) -> list[str]:
    """Normalize the ``keys`` argument every operator accepts: a bare
    string becomes a one-element list; any iterable is copied."""
    return [keys] if isinstance(keys, str) else list(keys)
