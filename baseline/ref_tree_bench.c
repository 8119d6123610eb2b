/* Baseline measurement driver: times MP-Gadget's short-range tree
 * gravity (force_tree_full + grav_short_tree from /root/reference,
 * compiled unmodified) on ONE rank / this host's cores, using the same
 * geometry as this repo's bench.py (N = ncbrt^3 grid + perturbations,
 * Nmesh = 2*ncbrt, Asmth 1.5, Rcut 6, ErrTolForceAcc 0.002).
 *
 * The PM half of the reference needs pfft (not in this image), so this
 * measures the tree walk + tree build only: a strict UPPER bound on the
 * reference's full TreePM step rate per core (a full step adds PM work
 * to the same walk).  API usage modeled on the reference's own
 * libgadget/tests/test_gravity.c (public test harness); the driver
 * itself is original.
 */
#include <mpi.h>
#include <math.h>
#include <omp.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <libgadget/utils/mymalloc.h>
#include <libgadget/utils/endrun.h>
#include <libgadget/partmanager.h>
#include <libgadget/walltime.h>
#include <libgadget/domain.h>
#include <libgadget/forcetree.h>
#include <libgadget/gravity.h>
#include <libgadget/petapm.h>
#include <libgadget/timestep.h>

static struct ClockTable CT;

int main(int argc, char **argv)
{
    MPI_Init(&argc, &argv);
    int ncbrt = argc > 1 ? atoi(argv[1]) : 64;
    int niter = argc > 2 ? atoi(argv[2]) : 3;
    /* mode: 0 = perturbed grid (IC-like), 1 = clustered mix */
    int clustered = argc > 3 ? atoi(argv[3]) : 1;

    const double BoxSize = 512000.; /* kpc/h, dm-small-like density */
    const double Asmth = 1.5;
    const int Nmesh = 2 * ncbrt;
    const double G = 43.0071;
    const int64_t N = (int64_t)ncbrt * ncbrt * ncbrt;

    tamalloc_init();
    mymalloc_init(3500);
    walltime_init(&CT);
    init_forcetree_params(0.7);
    gravshort_fill_ntab(SHORTRANGE_FORCE_WINDOW_TYPE_EXACT, Asmth);

    particle_alloc_memory(PartManager, BoxSize, N);
    memset(P, 0, sizeof(P[0]) * N);
    PartManager->NumPart = N;

    srand48(181170);
    const double cell = BoxSize / ncbrt;
    int64_t i;
    for (i = 0; i < N; i++) {
        P[i].Type = 1;
        P[i].Mass = 1.0;
        P[i].ID = i;
        P[i].IsGarbage = 0;
        P[i].TimeBinHydro = 0;
        P[i].TimeBinGravity = 0;
        P[i].TopLeaf = 0;
        double gx = (double)(i / ncbrt / ncbrt);
        double gy = (double)((i / ncbrt) % ncbrt);
        double gz = (double)(i % ncbrt);
        if (!clustered || i < N / 2) {
            /* Zel'dovich-ish: grid + up to half-cell displacements */
            P[i].Pos[0] = gx * cell + cell * (drand48() - 0.5);
            P[i].Pos[1] = gy * cell + cell * (drand48() - 0.5);
            P[i].Pos[2] = gz * cell + cell * (drand48() - 0.5);
        } else if (i < 3 * N / 4) {
            /* one collapsed blob: ~1/8 box across */
            P[i].Pos[0] = BoxSize * (0.5 + 0.125 * (drand48() - 0.5));
            P[i].Pos[1] = BoxSize * (0.5 + 0.125 * (drand48() - 0.5));
            P[i].Pos[2] = BoxSize * (0.5 + 0.125 * (drand48() - 0.5));
        } else {
            /* uniform background */
            P[i].Pos[0] = BoxSize * drand48();
            P[i].Pos[1] = BoxSize * drand48();
            P[i].Pos[2] = BoxSize * drand48();
        }
        int k;
        for (k = 0; k < 3; k++) {
            if (P[i].Pos[k] < 0) P[i].Pos[k] += BoxSize;
            if (P[i].Pos[k] >= BoxSize) P[i].Pos[k] -= BoxSize;
        }
    }

    /* Hand-built single-task domain: one root topnode that is also the
     * only topleaf (domain.c:1087 root init; TopLeaves gets the +1
     * end-marker entry, domain.c:205-206). */
    struct topnode_data topnodes[1];
    struct topleaf_data topleaves[2];
    struct task_data tasks[1];
    topnodes[0].StartKey = 0;
    topnodes[0].Shift = BITS_PER_DIMENSION * 3;
    topnodes[0].Daughter = -1;
    topnodes[0].Leaf = 0;
    topleaves[0].Task = 0;
    topleaves[0].topnode = 0;
    topleaves[0].treenode = 0;
    topleaves[1] = topleaves[0];
    tasks[0].StartLeaf = 0;
    tasks[0].EndLeaf = 1;
    DomainDecomp ddecomp = {0};
    ddecomp.domain_allocated_flag = 1;
    ddecomp.TopNodes = topnodes;
    ddecomp.TopLeaves = topleaves;
    ddecomp.NTopNodes = 1;
    ddecomp.NTopLeaves = 1;
    ddecomp.Tasks = tasks;
    ddecomp.DomainComm = MPI_COMM_WORLD;

    PetaPM pm = {0};
    pm.Nmesh = Nmesh;
    pm.Asmth = Asmth;
    pm.BoxSize = BoxSize;
    pm.CellSize = BoxSize / Nmesh;
    pm.G = G;
    pm.comm = MPI_COMM_WORLD;

    struct gravshort_tree_params treeacc = {0};
    treeacc.ErrTolForceAcc = 0.002;
    treeacc.BHOpeningAngle = 0.175;
    treeacc.MaxBHOpeningAngle = 0.9;
    treeacc.TreeUseBH = 2; /* reference default: BH first step only */
    treeacc.Rcut = 6.0;
    treeacc.FractionalGravitySoftening = 1. / 30.;
    set_gravshort_treepar(treeacc);
    gravshort_set_softenings(cell);

    const double Hubble = 0.1; /* internal units, h=1 */
    const double rho0 = 0.3 * 3 * Hubble * Hubble / (8 * M_PI * G);

    ActiveParticles act = {0};
    act.ActiveParticle = NULL;
    act.NumActiveParticle = N;
    act.NumActiveGravity = N;
    act.Particles = P;

    /* Warm-up: two walks so FullTreeGravAccel is set and the relative
     * opening criterion is active, as in production steps. */
    ForceTree Tree = {0};
    force_tree_full(&Tree, &ddecomp, 0, NULL);
    grav_short_tree(&act, &pm, &Tree, NULL, rho0, 0);
    grav_short_tree(&act, &pm, &Tree, NULL, rho0, 0);
    force_tree_free(&Tree);

    double tbuild = 0, twalk = 0;
    int it;
    for (it = 0; it < niter; it++) {
        double t0 = MPI_Wtime();
        force_tree_full(&Tree, &ddecomp, 0, NULL);
        double t1 = MPI_Wtime();
        grav_short_tree(&act, &pm, &Tree, NULL, rho0, 0);
        double t2 = MPI_Wtime();
        force_tree_free(&Tree);
        tbuild += t1 - t0;
        twalk += t2 - t1;
    }
    tbuild /= niter;
    twalk /= niter;

    double meanacc = 0;
    for (i = 0; i < N; i++) {
        int k;
        for (k = 0; k < 3; k++)
            meanacc += fabs(P[i].FullTreeGravAccel[k]);
    }
    meanacc /= (3. * N);

    printf("{\"metric\": \"reference short-range tree step\", "
           "\"ncbrt\": %d, \"npart\": %lld, \"nmesh\": %d, "
           "\"clustered\": %d, \"threads\": %d, "
           "\"tree_build_s\": %.4f, \"tree_walk_s\": %.4f, "
           "\"psteps_per_s_core\": %.1f, \"mean_abs_accel\": %.6g}\n",
           ncbrt, (long long)N, Nmesh, clustered, omp_get_max_threads(),
           tbuild, twalk, (double)N / (tbuild + twalk), meanacc);
    MPI_Finalize();
    return 0;
}
