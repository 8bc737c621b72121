from speinet_tpu.detector.features import focus_features, FOCUS_FEATURE_NAMES
from speinet_tpu.detector.classifier import (LogisticRegressionJAX, DecisionTree,
                                             fit_logistic_regression)
