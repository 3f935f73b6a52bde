from tpufcn.serve.detector import Detector, DetectionResult

__all__ = ["Detector", "DetectionResult"]
