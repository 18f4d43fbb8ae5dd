"""Operator library: dedup, similarity, text analysis, multimodal plumbing.

Everything here is built Catalyst-first: higher-order array functions and
built-in expressions in the hot path, Arrow-batched pandas UDFs only where
built-ins genuinely can't express the semantics (vectorized linear algebra,
opaque binary decoding).
"""
