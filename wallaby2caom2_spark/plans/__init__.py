"""Pipeline plan composition (the visitor-chain analog, Spark-first)."""
