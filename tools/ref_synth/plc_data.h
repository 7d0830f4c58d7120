/* stub: synthesis-only build, no PLC model */
#ifndef PLC_DATA_H
#define PLC_DATA_H
#define PLC_MAX_RNN_NEURONS 1
#define PLC_GRU1_STATE_SIZE 1
#define PLC_GRU2_STATE_SIZE 1
typedef struct { float gru1_state[PLC_GRU1_STATE_SIZE]; float gru2_state[PLC_GRU2_STATE_SIZE]; } PLCNetState;
typedef struct { int dummy; } PLCModel;
#endif
