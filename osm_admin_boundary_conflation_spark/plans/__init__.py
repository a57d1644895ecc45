"""Stage orchestration: checkpoint-resumable pipelines with lineage."""
