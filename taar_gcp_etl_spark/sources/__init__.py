"""Ingestion sources (SURVEY.md §2.1 S1-S4).

rest.py — partition-parallel REST fan-out: the Spark-native replacement for
the reference's 100-thread requests pool (taar_etl/taar_amodump.py:102-124).
"""
