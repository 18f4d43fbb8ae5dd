"""The ONE deterministic bounded documents sample used by every trainer.

Contract (the documents-table analog of
``vectors.deterministic_training_sample``'s crc32 contract): keep rows
where ``zlib.crc32(str(doc_id)) % m == 0`` with
``m = max(1, n_rows // sample_target)``, iterate id-sorted. Both the
Spark-side trainers and the oracle generators call THIS function, so a
bound change here changes every consumer in lockstep — it can never
silently fork between the perceptron and BPE trainers.
"""

from __future__ import annotations

import zlib


def crc32_sampled_documents(
    sf_dir: str, sample_target: int = 200
) -> list[tuple[int, str]]:
    """→ id-sorted ``[(doc_id, text), ...]``, ~``sample_target`` rows
    regardless of corpus size. Pure Python + pyarrow — replayable
    anywhere, no Spark session required."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    m = max(1, len(ids) // sample_target)
    return sorted(
        (i, x)
        for i, x in zip(ids, texts)
        if zlib.crc32(str(i).encode()) % m == 0
    )
