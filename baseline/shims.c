/* Tiny link shims for symbols whose home modules (timestep.c) would
 * drag in the whole integrator.  Semantics per the reference
 * (timestep.c:70-84): with everything on timebin 0, all bins are
 * active and the empty active-list forwards to the particle manager. */
#include <mpi.h>
#include <libgadget/partmanager.h>
#include <libgadget/timestep.h>

int is_timebin_active(int i, inttime_t current)
{
    (void)i; (void)current;
    return 1;
}

ActiveParticles init_empty_active_particles(struct part_manager_type *pman)
{
    ActiveParticles act = {0};
    act.ActiveParticle = NULL;
    act.NumActiveParticle = pman->NumPart;
    act.Particles = pman->Base;
    return act;
}
