"""Distributed crawl pipeline: frontier, seen-set, scheduler, rounds.

These components have no counterpart in the reference library — they are
specified by BASELINE.json's north_rule and designed Spark-first. The
extraction payload of the fetch stage is the kernel in
``jsonextract_spark.kernel``.
"""
