/* Dummy pfft.h: petapm.h only needs the plan/complex typedefs to lay
 * out struct PetaPM; the baseline harness never calls pfft. */
#ifndef MPG_BASELINE_PFFT_STUB_H
#define MPG_BASELINE_PFFT_STUB_H
typedef void *pfft_plan;
typedef double pfft_complex[2];
#endif
