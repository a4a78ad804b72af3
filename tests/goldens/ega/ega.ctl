# Synthetic-table EGA verification case
TBLBASE = ./synth
NG = 3
EMITTER[0] = CO2
EMITTER[1] = H2O
EMITTER[2] = O3
ND = 2
NU[0] = 792.0000
NU[1] = 832.0000
WRITE_BINARY = 0
READ_BINARY = 0
USEGPU = 0
