"""Research loop: iterative candidate proposal + benchmark scoring."""

from boxmot_tpu.engine.research.candidates import (  # noqa: F401
    Proposer,
    ast_mutation_proposer,
    create_proposer,
    llm_proposer,
)
from boxmot_tpu.engine.research.runner import (  # noqa: F401
    PenaltyConfig,
    ResearchRunner,
    SourceResearchRunner,
    run_research,
)
