"""Research loop: iterative candidate proposal + benchmark scoring."""

from boxmot_tpu.engine.research.runner import ResearchRunner, run_research  # noqa: F401
