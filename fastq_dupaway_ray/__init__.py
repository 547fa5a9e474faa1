"""fastq_dupaway_ray — a Ray-Data-native near-duplicate detection + clustering engine.

A from-scratch re-expression of the capabilities of AndrewSigorskih/fastq-dupaway
(reference at /root/reference, C++17 record dedup) as an idiomatic Ray Data engine
over Parquet tables of Common-Crawl-style web pages:

    (url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string)

Core capability map (reference file:line -> this package):

* hash-exact keep-first dedup   (src/hash_dup_remover.hpp:105-148) -> stages.dedup_exact
* sorted tight/loose adjacency  (src/seq_dup_remover.hpp:54-109)   -> stages.adjacency
* tail-hamming fuzzy dedup      (src/comparator.cpp:76-91)         -> stages.simhash (scale)
                                                                      + stages.adjacency (mirror)
* unordered id-join             (src/hash_dup_remover.hpp:257-347) -> stages.join
* duplicate-cluster emission    (src/file_utils.cpp:98-112)        -> stages.representative
* external merge sort           (src/external_sort.hpp:27-215)     -> ray.data Dataset.sort
* run counters (--verbose)      (src/seq_dup_remover.hpp:107-108)  -> pipeline metrics manifests

North-rule generalizations (not in the reference): MinHash+LSH banding,
SimHash Hamming-ball bucketing, shingle-containment pass, distributed
connected components, per-partition lineage manifests with resume.

No code is copied from the reference; it is cited as a behavioral spec only.
"""

__version__ = "0.1.0"
