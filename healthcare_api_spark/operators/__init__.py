"""Operator layer.

- ``relational``  : the FHIR-search query surface re-expressed as DataFrame
                    ops (SURVEY.md §2.3-§2.5, §2.7)
- ``transforms``  : R5→R4 per-resource-type schema transforms (§2.2)
- ``assay``       : the Assay multi-way join derivation (§3.2)
- ``dedup``       : exact / MinHash-LSH / SimHash / n-gram-Jaccard /
                    embedding near-dup (§2.10)
- ``similarity``  : brute-force + LSH-bucketed cosine top-k (§2.10)
- ``textops``     : language-ID, quality scoring, token counts,
                    fingerprinting (§2.10)
- ``multimodal``  : binary-payload columns with typed metadata (§2.10)
"""
