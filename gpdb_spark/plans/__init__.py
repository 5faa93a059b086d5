from gpdb_spark.plans.motion import explain_motion, motion_summary  # noqa: F401
