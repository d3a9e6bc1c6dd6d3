from gantron_tpu.ops.rnn import (LSTMParams, lstm_cell, lstm_params_init,
                                 lstm_scan, masked_bilstm)

__all__ = ["LSTMParams", "lstm_cell", "lstm_params_init", "lstm_scan",
           "masked_bilstm"]
