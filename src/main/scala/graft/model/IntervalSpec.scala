package graft.model

import graft.time.{BucketCalc, TimeStep}

/** One configured interval (kairos timeseries.py:369-393): a step, an
  * optional retention in buckets (`steps`), and an optional finer
  * resolution. `coarse` iff no distinct resolution — matching the
  * reference's `config['coarse'] = (resolution == step)`. */
final case class IntervalSpec(
    step: TimeStep,
    steps: Option[Int] = None,
    resolution: Option[TimeStep] = None) {
  val coarse: Boolean = resolution.forall(_ == step)
  def iCalc: BucketCalc = step.calc
  def rCalc: BucketCalc = resolution.getOrElse(step).calc
}

object IntervalSpec {
  def apply(step: String): IntervalSpec = IntervalSpec(TimeStep(step))
  def apply(step: String, steps: Int): IntervalSpec =
    IntervalSpec(TimeStep(step), Some(steps))
  def apply(step: String, resolution: String): IntervalSpec =
    IntervalSpec(TimeStep(step), None, Some(TimeStep(resolution)))
  def apply(step: Long): IntervalSpec = IntervalSpec(TimeStep(step))
}
