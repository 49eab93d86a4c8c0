"""The staged pipeline (SURVEY.md §3.2): URI mapping, taxonomy, shape
instances, value cleaning, facts, outputs — each stage a DataFrame job
checkpointed through the StageCatalog."""
