package graft.pipeline

/** M2: entity-class inference from claim signatures — re-expression of
  * the reference's WdMapper.guess_type
  * (`pipeline/sources/general/wikidata/mapper.py:121-295`): an instance-of
  * lookup table decides when present; otherwise a weighted vote over the
  * property signature, deterministic tie-break by class name. Pure
  * function — usable inside a typed Dataset.map stage. */
object WdTypes {

  /** instance-of (P31-style) value → entity class; first hit wins. */
  val instanceOf: Map[String, String] = Map(
    "Q5" -> "Person",
    "Q43229" -> "Group", "Q16917" -> "Group", "Q3918" -> "Group",
    "Q515" -> "Place", "Q6256" -> "Place", "Q486972" -> "Place",
    "Q16521" -> "Type", "Q11173" -> "Material",
    "Q34770" -> "Language", "Q8142" -> "Currency",
    "Q47461344" -> "LinguisticObject", "Q3305213" -> "HumanMadeObject",
    "Q1190554" -> "Event", "Q11514315" -> "Period")

  /** property presence → weighted class votes. */
  val propertyVotes: Map[String, Seq[(String, Int)]] = Map(
    "P569" -> Seq("Person" -> 3), // birth date
    "P570" -> Seq("Person" -> 3), // death date
    "P106" -> Seq("Person" -> 2), // occupation
    "P625" -> Seq("Place" -> 3), // coordinates
    "P1566" -> Seq("Place" -> 3), // geonames id
    "P571" -> Seq("Group" -> 1, "HumanMadeObject" -> 1), // inception
    "P112" -> Seq("Group" -> 2), // founded by
    "P279" -> Seq("Type" -> 2), // subclass of
    "P2079" -> Seq("Type" -> 1, "Material" -> 1), // fabrication method
    "P170" -> Seq("HumanMadeObject" -> 2, "VisualItem" -> 1), // creator
    "P186" -> Seq("HumanMadeObject" -> 1, "Material" -> 1), // made from
    "P407" -> Seq("LinguisticObject" -> 2), // language of work
    "P50" -> Seq("LinguisticObject" -> 2)) // author

  /** First P31 hit wins; else weighted property vote (max total weight,
    * ties broken by class name ascending); None when no signal. */
  def guessType(p31: Seq[String], props: Seq[String]): Option[String] = {
    p31.collectFirst { case v if instanceOf.contains(v) => instanceOf(v) }
      .orElse {
        val votes = props.flatMap(p => propertyVotes.getOrElse(p, Nil))
        if (votes.isEmpty) None
        else Some(votes.groupMapReduce(_._1)(_._2)(_ + _)
          .toSeq.minBy { case (cls, w) => (-w, cls) }._1)
      }
  }
}
