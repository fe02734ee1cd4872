"""Pure-numpy oracle implementations mirroring the reference semantics.

These exist only for testing: they re-state the reference's mathematical
contracts (Kalman recursions, tracker association logic) in independent
numpy code so the jitted TPU paths can be checked against them.
"""
