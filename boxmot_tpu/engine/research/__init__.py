"""Research loop: iterative candidate proposal + benchmark scoring."""

from boxmot_tpu.engine.research.runner import (  # noqa: F401
    PenaltyConfig,
    ResearchRunner,
    SourceResearchRunner,
    run_research,
)
