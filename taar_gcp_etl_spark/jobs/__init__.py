"""Job-level pipelines — one module per reference CLI job, re-expressed as a
single lazy Spark plan each (SURVEY.md §3). A user of the reference maps:

  python -m taar_etl.taar_amodump            → jobs.amodump.run
  python -m taar_etl.taar_amowhitelist       → jobs.amowhitelist.run
  python -m taar_etl.taar_lite_guid_ranking  → jobs.guid_ranking.run
  python -m taar_etl.taar_update_whitelist   → jobs.update_whitelist.run
  python -m taar_etl.taar_profile_bigtable   → jobs.profile_serving.{fill,load,delete_opt_out}

The reference's 5-stage Airflow DAG (CTAS → Avro export → Beam load → wipe →
delete) collapses into one plan with two write actions (SURVEY.md §3.1).
"""
