/* Test harness: compiles the REFERENCE's hw-skymodel C code directly from
 * /root/reference (read-only) and dumps sky_state values for comparison
 * against the Python port (tests/test_cross_validation.py).
 *
 * Usage: sky_dump <elevation_rad> <turbidity> <albedo_r> <albedo_g> <albedo_b>
 * Prints 33 floats (27 params, 3 sky radiances, 3 solar radiances), one per
 * line, with %.9g precision.
 */

#include <hw-skymodel/hw_skymodel.h>

#include <stdio.h>
#include <stdlib.h>

int main(int argc, char** argv)
{
    if (argc != 6)
    {
        fprintf(stderr, "usage: sky_dump elev turb ar ag ab\n");
        return 1;
    }
    const sky_params params = {
        .elevation = (float)atof(argv[1]),
        .turbidity = (float)atof(argv[2]),
        .albedo = {(float)atof(argv[3]), (float)atof(argv[4]), (float)atof(argv[5])},
    };
    sky_state state;
    if (sky_state_new(&params, &state) != sky_state_result_success)
    {
        fprintf(stderr, "sky_state_new failed\n");
        return 2;
    }
    for (int i = 0; i < 27; ++i) printf("%.9g\n", state.params[i]);
    for (int i = 0; i < 3; ++i) printf("%.9g\n", state.sky_radiances[i]);
    for (int i = 0; i < 3; ++i) printf("%.9g\n", state.solar_radiances[i]);
    return 0;
}
