# refspec window template (NU[] appended per window by the driver loop)
TBLBASE = ./synth
NG = 3
EMITTER[0] = CO2
EMITTER[1] = H2O
EMITTER[2] = O3
ND = 100
WRITE_BINARY = 0
READ_BINARY = 0
USEGPU = 0
