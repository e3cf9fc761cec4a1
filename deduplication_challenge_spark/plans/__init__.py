"""Pipeline plans: stage orchestration, checkpoint/resume manifests, counters."""
