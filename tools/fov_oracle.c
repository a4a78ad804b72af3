/* FOV-convolution oracle harness.
 *
 * jurassic-gpu defines formod_fov (jurassic.c:214-258) but no execution
 * driver calls it (upstream JURASSIC applies it inside formod).  This
 * harness links the reference jurassic.o and applies formod_fov to an
 * obs file whose rad/tau columns were produced by the reference formod,
 * producing a genuine C-oracle golden for the convolution:
 *
 *   fov_oracle <ctl> <obs_in> <obs_out> [NAME value ...]
 */
#include "jurassic.h"

int main(int argc, char *argv[]) {
	static ctl_t ctl;
	static obs_t obs;
	if (argc < 4) ERRMSG("Give parameters: <ctl> <obs_in> <obs_out>");
	read_ctl(argc, argv, &ctl);
	read_obs(".", argv[2], &ctl, &obs);
	formod_fov(&ctl, &obs);
	write_obs(".", argv[3], &ctl, &obs);
	return 0;
}
