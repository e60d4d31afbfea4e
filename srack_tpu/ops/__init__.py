from .basic import transition, transition_init, block_transitions, poly_blep

__all__ = ["transition", "transition_init", "block_transitions", "poly_blep"]
