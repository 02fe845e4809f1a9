"""Query planning: workflow DAG runner, estimate/admission control."""
