from rvt_tpu.evaluation.prophesee import PropheseeEvaluator, evaluate_list
