package graft.sources

/** S8 — classpath SQL/resource loader (SURVEY §2.1): the reference
  * ships each job's pushed-down SQL as a classpath resource and loads it
  * with commons-io (`Core/src/main/java/org.kenyahmis.core/
  * FileUtils.java:9-19`); plain `scala.io.Source` does the same. */
object Resources {
  def loadText(name: String): String = {
    val src = scala.io.Source.fromResource(name)
    try src.mkString finally src.close()
  }
}
