from fos_tpu.sets.sets import (  # noqa: F401
    AffineSet,
    Ball,
    BlockSet,
    Box,
    ConeSet,
    FunctionSet,
    Halfspace,
    NonNeg,
    NonPos,
    Point,
)
