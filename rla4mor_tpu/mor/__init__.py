from rla4mor_tpu.mor.sketched_reductor import SketchedReductor
from rla4mor_tpu.mor.greedy import rb_greedy, GreedyResult

__all__ = ["SketchedReductor", "rb_greedy", "GreedyResult"]
