from multimodal_sc_tpu.evaluation.metrics import confusion_matrix, miou, mse, psnr
from multimodal_sc_tpu.evaluation import policy_eval, policy_sweep, snr_sweep
