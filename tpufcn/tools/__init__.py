from tpufcn.tools.capture import ImageRectWriter
from tpufcn.tools.features import CnnCodeExtractor
from tpufcn.tools.roi_classifier import (
    ROIClassifier, ROIClassifierNode)
from tpufcn.tools.boundary_refinement import (
    BoundaryRefiner, BoundaryRefinerNode)
from tpufcn.tools.rank_proposals import RankObjectProposals

__all__ = [
    "ImageRectWriter", "CnnCodeExtractor", "ROIClassifier",
    "ROIClassifierNode",
    "BoundaryRefiner", "BoundaryRefinerNode", "RankObjectProposals",
]
